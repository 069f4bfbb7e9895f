"""Pallas matcher kernels vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from aldi_tpu.ops import boxes as B
from aldi_tpu.ops.matcher import match
from aldi_tpu.ops.pallas_match import (
    match_boxes_pallas,
    match_iou_pallas,
)


def random_boxes(n, size, seed):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(5, size / 3, (n, 2))
    return jnp.asarray(
        np.concatenate([xy, xy + wh], 1).astype(np.float32)
    )


def test_match_iou_pallas_vs_xla():
    anchors = random_boxes(1000, 200, 0)  # non-multiple of block: pad path
    gt = random_boxes(7, 200, 1)
    gv = jnp.asarray([True] * 5 + [False] * 2)

    vals, idx, best = match_iou_pallas(anchors, gt, gv, interpret=True)

    iou = B.pairwise_iou(anchors, gt)
    iou_m = jnp.where(gv[None, :], iou, -1.0)
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(iou_m.max(1)), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(idx), np.asarray(iou_m.argmax(1))
    )
    np.testing.assert_allclose(
        np.asarray(best), np.asarray(iou_m.max(0)), rtol=1e-6
    )


def test_match_boxes_pallas_full_semantics():
    anchors = random_boxes(2000, 300, 2)
    gt = random_boxes(9, 300, 3)
    gv = jnp.ones(9, bool)

    idx_p, lab_p = match_boxes_pallas(
        anchors, gt, gv, [0.3, 0.7], [0, -1, 1], allow_low_quality=True,
        interpret=True,
    )
    iou = B.pairwise_iou(anchors, gt)
    idx_x, lab_x = match(iou, gv, [0.3, 0.7], [0, -1, 1],
                         allow_low_quality=True)
    np.testing.assert_array_equal(np.asarray(lab_p), np.asarray(lab_x))
    # argmax ties may differ only where labels say ignore/bg; fg must agree
    fg = np.asarray(lab_x) == 1
    np.testing.assert_array_equal(
        np.asarray(idx_p)[fg], np.asarray(idx_x)[fg]
    )


def test_match_boxes_pallas_no_valid_gt():
    anchors = random_boxes(256, 100, 4)
    gt = random_boxes(3, 100, 5)
    gv = jnp.zeros(3, bool)
    _, lab = match_boxes_pallas(
        anchors, gt, gv, [0.3, 0.7], [0, -1, 1], True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(lab), 0)
