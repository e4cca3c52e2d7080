"""LAMB trajectory parity vs the ACTUAL reference optimizer.

The fused [P]-vector LAMB (train/optim.py make_fused_optimizer, the
path driver config #5 runs) was equivalence-tested against the per-leaf
optax chain, but never against reference model/lamb.py — whose
deprecated ``add_(scalar, tensor)`` call order is a known quirk
(SURVEY §7.4). This trains both frameworks with their own LAMB on the
recorded-batch harness and compares NLL trajectories. Full 50-step run
recorded in PARITY.md (max diff 7.2e-7).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "model"))

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


@pytest.mark.skipif(not HAS_REF, reason="reference unavailable")
def test_lamb_trajectory_matches_reference():
    pytest.importorskip("torch")
    from convergence_parity import run_comparison

    res = run_comparison(n_steps=30, eval_every=15, optim="lamb")
    tdiff = np.abs(np.asarray(res["ours_train"])
                   - np.asarray(res["ref_train"])).max()
    vdiff = np.abs(np.asarray(res["ours_val"])
                   - np.asarray(res["ref_val"])).max()
    assert tdiff < 5e-5, tdiff
    assert vdiff < 5e-5, vdiff
    # and the run actually optimized (NLL strictly decreased)
    assert res["ours_train"][-1] < res["ours_train"][0]
