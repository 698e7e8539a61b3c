"""Driver-gate coverage: __graft_entry__.entry() and dryrun_multichip(n)
must work in the DRIVER's process conditions, not just under conftest's
pre-forced CPU platform (round-1 regression: MULTICHIP_r01.json ok=false —
dryrun assumed the caller already exposed 8 devices).

Each scenario runs in a fresh subprocess with a controlled environment.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(**overrides):
    """Environment as the driver would have it: no conftest CPU forcing."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.update(overrides)
    return env


def _run(code, env, timeout=900):
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_devices():
    """Fresh process, jax untouched: dryrun_multichip(8) must itself force
    the 8-device virtual CPU platform (the driver gate scenario)."""
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    # Keep JAX_PLATFORMS unset so dryrun must do the forcing itself.
    proc = _run(code, _clean_env())
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK on 8 devices" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_jax_initialized_small():
    """Round-1 failure mode: the process already initialized jax with ONE
    device (stand-in for the 1-chip axon TPU platform).  dryrun_multichip(8)
    must detect this and succeed via its clean-subprocess fallback."""
    code = (
        "import os; "
        "os.environ['JAX_PLATFORMS']='cpu'; "
        "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=1'; "
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8); "
        "print('FALLBACK_OK')"
    )
    proc = _run(code, _clean_env())
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "FALLBACK_OK" in proc.stdout


@pytest.mark.slow
def test_entry_compiles_single_chip():
    """entry() must return (fn, example_args) that jit-compile and run."""
    code = (
        "import os; "
        "os.environ['JAX_PLATFORMS']='cpu'; "
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import __graft_entry__ as g; "
        "fn, args = g.entry(); "
        "out = jax.jit(fn)(*args); "
        "jax.block_until_ready(out); "
        "import numpy as np; "
        "assert np.isfinite(np.asarray(out, dtype=np.float32)).all(); "
        "print('ENTRY_OK', out.shape)"
    )
    proc = _run(code, _clean_env())
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ENTRY_OK" in proc.stdout
