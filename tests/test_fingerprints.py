"""Round-over-round numeric pinning (VERDICT r4 item 7): fixed-seed,
random-weight sampling fingerprints for the dense / STA / long-tile
paths must match the committed goldens.  When real weights land, this is
what separates conversion bugs from code drift.

Regenerate intentionally with:
  python scripts/fingerprints.py record --set cpu
"""

import json
import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
sys.path.insert(0, SCRIPTS)


@pytest.mark.slow
def test_cpu_fingerprints_match_goldens():
    import fingerprints as fp

    path = os.path.join(fp.GOLDENS_DIR, "fingerprints_cpu.json")
    assert os.path.exists(path), (
        "goldens missing; run: python scripts/fingerprints.py record --set cpu")
    with open(path) as f:
        want = json.load(f)["fingerprints"]
    got = fp.compute_all(fp.TINY_GEOMS, verbose=False)
    hard, msgs = fp.compare(got, want, rtol=1e-4)
    assert not hard, "\n".join(msgs)
