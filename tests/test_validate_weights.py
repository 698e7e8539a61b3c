"""scripts/validate_weights.py — the weights-day acceptance chain
(VERDICT r2 item 5).  Unit tests for the orchestration pieces run fast;
the full smoke chain (2 sampling subprocesses + FVD) is `slow`.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import validate_weights as vw  # noqa: E402


def _make_case(d, prompt=None):
    os.makedirs(d, exist_ok=True)
    open(os.path.join(d, "ref.png"), "wb").write(b"x")
    open(os.path.join(d, "rendered.gif"), "wb").write(b"x")
    open(os.path.join(d, "GT.gif"), "wb").write(b"x")
    if prompt:
        open(os.path.join(d, "prompt.txt"), "w").write(prompt)


def test_find_cases_and_prompts(tmp_path):
    _make_case(tmp_path / "001", "a dancer")
    _make_case(tmp_path / "002")
    os.makedirs(tmp_path / "incomplete")  # no ref/pose -> skipped
    cases = vw.find_cases(str(tmp_path))
    assert [os.path.basename(d) for d, _ in cases] == ["001", "002"]
    assert cases[0][1] == "a dancer"
    assert "dancing" in cases[1][1]

    pf = tmp_path / "prompts.txt"
    vw.write_prompt_file(cases, str(pf))
    lines = open(pf).read().splitlines()
    assert lines[0] == f"a dancer@@{cases[0][0]}"


def test_collect_outputs_and_gt(tmp_path):
    case = tmp_path / "ex" / "001"
    _make_case(case)
    sample_out = tmp_path / "samples" / "001"
    os.makedirs(sample_out)
    open(sample_out / "001_output_000000.mp4", "wb").write(b"v")
    open(sample_out / "001_inputs.png", "wb").write(b"i")  # not a video

    n = vw.collect_outputs(str(tmp_path / "samples"), str(tmp_path / "flat"))
    assert n == 1 and len(os.listdir(tmp_path / "flat")) == 1
    cases = vw.find_cases(str(tmp_path / "ex"))
    n_gt = vw.collect_gt(cases, str(tmp_path / "flat_gt"))
    assert n_gt == 1


def test_parse_tail_float():
    text = "noise\nFVD: 123.456\nmore\nFVD: 99.5 (final)\n"
    assert vw.parse_tail_float(text, "FVD:") == 99.5
    assert vw.parse_tail_float("no match", "FVD:") is None


def test_sta_gate():
    assert vw.sta_gate(100.0, 105.0, 1.10)       # within 10%
    assert not vw.sta_gate(100.0, 125.0, 1.10)   # 25% worse
    assert vw.sta_gate(1.0, 5.9, 1.10)           # absolute +5 floor
    assert not vw.sta_gate(None, 50.0, 1.10)     # missing scores fail


def test_marker_flips_cli_attn_impl_default(tmp_path):
    """arguments.py: sta_validated.json next to --load defaults the CLI
    to attn_impl='sta'; explicit --attn-impl still wins."""
    from scail_tpu.cli.arguments import get_args

    ckpt = tmp_path / "converted"
    os.makedirs(ckpt)
    json.dump({"validated": True, "fvd_dense": 90.0, "fvd_sta": 93.0},
              open(ckpt / "sta_validated.json", "w"))

    base = ["--base", "configs/video_model/scail_1p3b.yaml",
            "configs/sampling/pose_cli.yaml", "--input-type", "txt",
            "--input-file", "/dev/null"]
    _, mc = get_args(base + ["--load", str(ckpt)])
    assert mc["network_config"]["params"]["attn_impl"] == "sta"
    _, mc = get_args(base + ["--load", str(ckpt), "--attn-impl", "pallas"])
    assert mc["network_config"]["params"]["attn_impl"] == "pallas"
    # unvalidated marker -> no flip
    json.dump({"validated": False}, open(ckpt / "sta_validated.json", "w"))
    _, mc = get_args(base + ["--load", str(ckpt)])
    assert mc["network_config"]["params"].get("attn_impl") is None
    # no marker -> no flip
    os.remove(ckpt / "sta_validated.json")
    _, mc = get_args(base + ["--load", str(ckpt)])
    assert mc["network_config"]["params"].get("attn_impl") is None


@pytest.mark.slow
def test_validate_weights_smoke_end_to_end(tmp_path):
    """The full chain in random-init smoke mode on the synthetic example:
    convert is skipped, both sampling passes run the real CLI, FVD runs
    against GT, and the gate decision is reported."""
    out = tmp_path / "validate"
    # one case keeps the smoke bounded on the 1-core host (examples_synth
    # has two fixtures; each costs ~2 sampling subprocesses)
    ex = tmp_path / "examples"
    import shutil

    shutil.copytree(os.path.join(REPO, "examples_synth", "001"),
                    str(ex / "001"))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single CPU device is enough + faster
    proc = subprocess.run(
        [sys.executable, "scripts/validate_weights.py", "--smoke",
         "--examples", str(ex), "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, proc.stderr[-3000:] + proc.stdout[-2000:]
    line = [l for l in proc.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    report = json.loads(line)
    assert report["stages"]["sample_dense"]["videos"] >= 1
    assert report["stages"]["sample_sta"]["videos"] >= 1
    assert report["smoke"] is True
    assert report["fvd_dense"] is not None and report["fvd_sta"] is not None
    # clip stage runs on extracted middle frames (random-init smoke)
    assert report["clip_score"] is not None
    assert "sta_validated" in report
