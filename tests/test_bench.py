"""bench.py contract: emits exactly one valid JSON line with the required
keys on any backend (CPU smoke path here)."""

import json
import os
import subprocess
import sys


def test_bench_emits_json_line():
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="")  # don't touch the shared cache
    env.pop("JAX_COMPILATION_CACHE_DIR")
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import bench; bench.main()"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # the driver contract is ONE JSON line on stdout -- diagnostics must
    # ride stderr, so any extra non-empty stdout line is a violation
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1 and lines[0].startswith("{"), out.stdout
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert rec["unit"] == "ms" and rec["value"] > 0
