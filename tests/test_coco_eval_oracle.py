"""Calibration of the native COCOeval (aldi_tpu/engine/coco_eval.py) against
a loop-faithful transcription of pycocotools' algorithm
(tests/pycocotools_oracle.py) — the reference's evaluator is pycocotools
(aldi/helpers.py:65-81), and AP50 is the headline metric, so the native
protocol must agree to float precision on adversarial cases: crowds,
area-range ignores, score ties, multi-category, empty images, dets matching
ignored gt, categories with no gt."""

import numpy as np
import pytest

from aldi_tpu.engine.coco_eval import evaluate_detections
from tests.pycocotools_oracle import evaluate_oracle


def _assert_match(preds, anns, cats):
    got = evaluate_detections(preds, anns, cats)
    want = evaluate_oracle(preds, anns, cats)
    for k in want:
        if np.isnan(want[k]):
            assert np.isnan(got[k]), (k, got[k], want[k])
        else:
            np.testing.assert_allclose(got[k], want[k], atol=1e-9,
                                       err_msg=k)


def _random_case(seed, n_imgs=4, n_cats=3, crowd_p=0.2, ignore_p=0.15,
                 tie_scores=False, max_gt=6, max_det=10):
    rng = np.random.default_rng(seed)
    preds, anns = {}, {}
    for img in range(n_imgs):
        anns[img] = []
        for _ in range(rng.integers(0, max_gt + 1)):
            w, h = rng.uniform(4, 120, 2)
            x, y = rng.uniform(0, 200, 2)
            g = {
                "bbox": [x, y, w, h],
                "category_id": int(rng.integers(0, n_cats)),
                "iscrowd": int(rng.random() < crowd_p),
            }
            if rng.random() < ignore_p:
                g["ignore"] = 1
            if rng.random() < 0.5:
                # non-bbox area (e.g. segmentation area), exercises the
                # gt-area-range path using the annotation's own area
                g["area"] = float(w * h * rng.uniform(0.5, 1.0))
            anns[img].append(g)
        preds[img] = []
        for _ in range(rng.integers(0, max_det + 1)):
            if anns[img] and rng.random() < 0.7:
                # perturbation of a gt box (realistic near-matches)
                g = anns[img][rng.integers(0, len(anns[img]))]
                x, y, w, h = g["bbox"]
                x += rng.normal(0, 6)
                y += rng.normal(0, 6)
                w = max(2.0, w + rng.normal(0, 8))
                h = max(2.0, h + rng.normal(0, 8))
                cat = g["category_id"] if rng.random() < 0.8 else int(
                    rng.integers(0, n_cats))
            else:
                w, h = rng.uniform(4, 120, 2)
                x, y = rng.uniform(0, 200, 2)
                cat = int(rng.integers(0, n_cats))
            score = (
                float(rng.integers(1, 5)) / 4.0 if tie_scores
                else float(rng.random())
            )
            preds[img].append({
                "bbox": [float(x), float(y), float(w), float(h)],
                "score": score, "category_id": cat,
            })
    return preds, anns, list(range(n_cats))


@pytest.mark.parametrize("seed", range(12))
def test_randomized_parity(seed):
    _assert_match(*_random_case(seed))


@pytest.mark.parametrize("seed", range(12, 18))
def test_randomized_parity_score_ties(seed):
    _assert_match(*_random_case(seed, tie_scores=True))


@pytest.mark.parametrize("seed", range(18, 22))
def test_randomized_parity_crowd_heavy(seed):
    _assert_match(*_random_case(seed, crowd_p=0.6, ignore_p=0.3))


def test_crowd_rematchable_and_ignored():
    # two dets both overlap one crowd gt: neither is a FP, neither a TP
    anns = {0: [
        {"bbox": [0, 0, 50, 50], "category_id": 0, "iscrowd": 1},
        {"bbox": [100, 100, 40, 40], "category_id": 0, "iscrowd": 0},
    ]}
    preds = {0: [
        {"bbox": [2, 2, 48, 48], "score": 0.9, "category_id": 0},
        {"bbox": [1, 1, 49, 49], "score": 0.8, "category_id": 0},
        {"bbox": [101, 101, 39, 39], "score": 0.7, "category_id": 0},
    ]}
    _assert_match(preds, anns, [0])
    r = evaluate_detections(preds, anns, [0])
    assert r["bbox/AP50"] == pytest.approx(100.0)


def test_area_range_boundaries():
    # gt exactly at 32^2 and 96^2 boundaries (inclusive on both ends)
    anns = {0: [
        {"bbox": [0, 0, 32, 32], "category_id": 0, "iscrowd": 0},
        {"bbox": [100, 100, 96, 96], "category_id": 0, "iscrowd": 0},
    ]}
    preds = {0: [
        {"bbox": [0, 0, 32, 32], "score": 0.9, "category_id": 0},
        {"bbox": [100, 100, 96, 96], "score": 0.8, "category_id": 0},
    ]}
    _assert_match(preds, anns, [0])


def test_det_matching_ignored_gt_not_fp():
    anns = {0: [
        {"bbox": [0, 0, 50, 50], "category_id": 0, "iscrowd": 0,
         "ignore": 1},
        {"bbox": [100, 0, 50, 50], "category_id": 0, "iscrowd": 0},
    ]}
    preds = {0: [
        {"bbox": [0, 0, 50, 50], "score": 0.95, "category_id": 0},
        {"bbox": [100, 0, 50, 50], "score": 0.5, "category_id": 0},
    ]}
    _assert_match(preds, anns, [0])
    r = evaluate_detections(preds, anns, [0])
    assert r["bbox/AP50"] == pytest.approx(100.0)


def test_category_with_dets_but_no_gt_excluded():
    anns = {0: [{"bbox": [0, 0, 50, 50], "category_id": 0, "iscrowd": 0}]}
    preds = {0: [
        {"bbox": [0, 0, 50, 50], "score": 0.9, "category_id": 0},
        {"bbox": [60, 60, 20, 20], "score": 0.8, "category_id": 1},
    ]}
    _assert_match(preds, anns, [0, 1])


def test_empty_predictions():
    anns = {0: [{"bbox": [0, 0, 50, 50], "category_id": 0, "iscrowd": 0}],
            1: []}
    preds = {0: [], 1: []}
    _assert_match(preds, anns, [0])
    r = evaluate_detections(preds, anns, [0])
    assert r["bbox/AP50"] == 0.0


def test_more_than_maxdets():
    rng = np.random.default_rng(0)
    anns = {0: [{"bbox": [i * 10.0, 0, 8, 8], "category_id": 0,
                 "iscrowd": 0} for i in range(20)]}
    preds = {0: [{"bbox": [float(rng.uniform(0, 200)), 0, 8, 8],
                  "score": float(rng.random()), "category_id": 0}
                 for _ in range(130)]}
    _assert_match(preds, anns, [0])
