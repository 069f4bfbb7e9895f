"""Unit tests for the density-matched teacher-threshold recommendation
(tools/calibrate_threshold.py::recommend_threshold).

The DAOD efficacy protocol calibrates DOMAIN_ADAPT.TEACHER.THRESHOLD
against the burn-in teacher's score distribution on the target split: the
recommended threshold is the exact score quantile at which pseudo-label
density equals the GT object density (the reference's fixed 0.8 presumes a
COCO-pretrained teacher; see tools/efficacy_experiment.py).
"""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.calibrate_threshold import recommend_threshold


def _rows(mean, std, n_images=256, dets=20, seed=0):
    rng = np.random.default_rng(seed)
    return [np.clip(rng.normal(mean, std, dets), 0, 1)
            for _ in range(n_images)]


def test_density_matches_gt():
    rows = _rows(0.26, 0.05)
    gt = 2.04
    thr = recommend_threshold(rows, gt)
    dens = float(np.mean([(r > thr).sum() for r in rows]))
    assert abs(dens - gt) < 0.1, (thr, dens)


def test_monotone_in_gt_density():
    # denser GT -> lower threshold (more pseudo-labels pass)
    rows = _rows(0.3, 0.08)
    t_sparse = recommend_threshold(rows, 1.0)
    t_dense = recommend_threshold(rows, 4.0)
    assert t_dense < t_sparse


def test_starved_teacher_returns_none():
    # teacher emits almost nothing above the background floor
    rows = [np.array([0.2, 0.03])] * 4
    assert recommend_threshold(rows, 2.0) is None


def test_empty_rows_returns_none():
    assert recommend_threshold([], 2.0) is None


def test_floor_excludes_background_noise():
    # a flood of sub-floor detections must not drag the threshold to ~0
    rng = np.random.default_rng(1)
    rows = [np.concatenate([rng.uniform(0.0, 0.04, 50),   # background junk
                            rng.uniform(0.5, 0.9, 3)])    # real detections
            for _ in range(64)]
    thr = recommend_threshold(rows, 2.0)
    assert thr > 0.4, thr
