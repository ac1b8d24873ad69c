"""Opt-in END-TO-END cross-framework parity (tools/parity_e2e.py).

Runs the reference's shape_extract.py / stage2 eval.py / evaluation.py
semantics with the LIVE torch modules against psnerf_tpu's pipeline from one
shared converted checkpoint per stage, and asserts every on-disk artifact
matches within the harness tolerances. `make parity-e2e` produces the full
RESULTS_parity_e2e.json at the repo root; this test is the suite hook.
"""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("PSNERF_REF_E2E") != "1",
    reason="opt-in e2e parity vs the reference tree (set PSNERF_REF_E2E=1; "
           "imports and executes torch code from /root/reference)",
)


def test_parity_e2e(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        from parity_e2e import run_parity_e2e
    finally:
        sys.path.pop(0)

    res = run_parity_e2e(str(tmp_path / "work"), hw=48)
    assert res["pass"], json.dumps(res["failures"], indent=1)
    # the shared-checkpoint legs actually rendered something non-trivial
    assert res["stage1"]["mask"]["mask_mismatch_frac"] == 0.0
    assert res["checks"]["stage2.rgb.max_abs"] < 1e-6
