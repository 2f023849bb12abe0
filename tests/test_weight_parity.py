"""Post-step weight parity vs the LIVING reference loop (slow tier).

Thin wrapper over tools/weight_parity.py — the recorded run lives in
WEIGHT_PARITY.json; this keeps the surface under pytest so regressions in
the faithful train step's gradients/optimizer show up in CI.  See the tool
docstring for what is exercised (reference train_test.py:165-280,
train_utils.py:21-120, torch.optim.SGD semantics).
"""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(ROOT, "tools") not in sys.path:
    sys.path.insert(0, os.path.join(ROOT, "tools"))


@pytest.mark.slow
def test_post_step_weights_match_reference(tmp_path):
    import weight_parity
    out = str(tmp_path / "weight_parity.json")
    assert weight_parity.main(["--steps", "2", "--out", out]) == 0
