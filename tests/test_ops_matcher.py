import numpy as np
import jax
import jax.numpy as jnp

from aldi_tpu.ops.matcher import match, subsample_labels, sample_fixed_indices
from aldi_tpu.ops.boxes import pairwise_iou


def test_match_rpn_thresholds():
    # one gt, three anchors: high / mid / low IoU
    gt = jnp.asarray([[0.0, 0, 10, 10]])
    anchors = jnp.asarray(
        [[0.0, 0, 10, 10], [0, 0, 10, 20], [50, 50, 60, 60]]
    )
    iou = pairwise_iou(anchors, gt)
    idx, labels = match(iou, jnp.ones(1, bool), [0.3, 0.7], [0, -1, 1], True)
    np.testing.assert_array_equal(np.asarray(labels), [1, -1, 0])
    np.testing.assert_array_equal(np.asarray(idx), [0, 0, 0])


def test_match_low_quality_promotes_best():
    # gt has max IoU 0.25 with anchor 0 (below fg threshold); low-quality
    # matching should still promote it
    gt = jnp.asarray([[0.0, 0, 10, 40]])
    anchors = jnp.asarray([[0.0, 0, 10, 10], [100, 100, 110, 110]])
    iou = pairwise_iou(anchors, gt)
    _, labels = match(iou, jnp.ones(1, bool), [0.3, 0.7], [0, -1, 1], True)
    np.testing.assert_array_equal(np.asarray(labels), [1, 0])
    # without low-quality matching it stays background
    _, labels2 = match(iou, jnp.ones(1, bool), [0.3, 0.7], [0, -1, 1], False)
    np.testing.assert_array_equal(np.asarray(labels2), [0, 0])


def test_match_no_valid_gt_all_background():
    iou = jnp.ones((5, 3)) * 0.9
    _, labels = match(iou, jnp.zeros(3, bool), [0.5], [0, 1], False)
    np.testing.assert_array_equal(np.asarray(labels), 0)


def test_subsample_respects_counts():
    key = jax.random.PRNGKey(0)
    labels = jnp.asarray([1] * 10 + [0] * 100 + [-1] * 5)
    pos, neg = subsample_labels(key, labels, 32, 0.5)
    assert int(pos.sum()) == 10  # fewer positives than cap (16)
    assert int(neg.sum()) == 22  # fills to 32
    assert not bool((pos & neg).any())
    # ignores never sampled
    assert not bool(pos[-5:].any() or neg[-5:].any())


def test_subsample_caps_positives():
    key = jax.random.PRNGKey(1)
    labels = jnp.asarray([1] * 50 + [0] * 50)
    pos, neg = subsample_labels(key, labels, 32, 0.25)
    assert int(pos.sum()) == 8
    assert int(neg.sum()) == 24


def test_sample_fixed_indices():
    key = jax.random.PRNGKey(2)
    pos = jnp.asarray([True] * 4 + [False] * 60)
    neg = jnp.asarray([False] * 4 + [True] * 12 + [False] * 48)
    idx, valid, is_pos = sample_fixed_indices(key, pos, neg, 32)
    assert idx.shape == (32,)
    assert int(valid.sum()) == 16
    assert int(is_pos.sum()) == 4
    # sampled indices must point at sampled elements
    chosen = np.asarray(idx)[np.asarray(valid)]
    assert set(chosen) == set(range(16))
