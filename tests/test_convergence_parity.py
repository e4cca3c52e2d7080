"""Training-trajectory parity vs the torch reference (not just init-time
parity): identical init weights + identical recorded batches + matched
Adam/inv_sqrt/clip/micro-chunk loss semantics must give matching train and
val NLL trajectories (reference hot loop model/train.py:831-1334)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")),
    reason="reference checkout not available")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_training_trajectory_matches_reference():
    from convergence_parity import run_comparison
    res = run_comparison(n_steps=60, eval_every=20)

    ours_t = np.asarray(res["ours_train"])
    ref_t = np.asarray(res["ref_train"])
    both = np.isfinite(ours_t) & np.isfinite(ref_t)
    assert both.sum() >= 55
    np.testing.assert_allclose(ours_t[both], ref_t[both], atol=5e-4)

    ours_v = np.asarray(res["ours_val"])
    ref_v = np.asarray(res["ref_val"])
    assert len(ours_v) == 3
    np.testing.assert_allclose(ours_v, ref_v, atol=5e-4)

    # and training actually learned something (the corpus is Markov,
    # not uniform noise)
    assert ref_v[-1] < ref_v[0] - 0.2
