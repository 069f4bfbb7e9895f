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


def test_rpn_losses_sampled_equals_dense():
    """The sampled-index rpn_losses (K gathered anchors) must equal the
    dense masked-reduction formulation on the same sampled set."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aldi_tpu.models.rpn import label_anchors_sampled
    from aldi_tpu.ops import boxes as box_ops
    from aldi_tpu.ops.losses import bce_with_logits, smooth_l1
    from aldi_tpu.models.rpn import rpn_losses

    rng = np.random.default_rng(0)
    n, b, g = 500, 2, 5
    anchors = rng.uniform(0, 200, (n, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(5, 40, (n, 2))
    gtb = rng.uniform(0, 200, (b, g, 4)).astype(np.float32)
    gtb[..., 2:] = gtb[..., :2] + rng.uniform(10, 50, (b, g, 2))
    gtv = np.ones((b, g), bool)
    logits = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))
    deltas = jnp.asarray(rng.normal(size=(b, n, 4)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(3)
    k = 64

    out = rpn_losses(key, jnp.asarray(anchors), logits, deltas,
                     jnp.asarray(gtb), jnp.asarray(gtv),
                     batch_size_per_image=k)

    idx, valid, is_pos, matched_gt = label_anchors_sampled(
        key, jnp.asarray(anchors), jnp.asarray(gtb), jnp.asarray(gtv), k)
    # dense reference: scatter the sampled set back to [B, N] masks
    dense_cls = 0.0
    dense_loc = 0.0
    for bi in range(b):
        for j in range(k):
            if not bool(valid[bi, j]):
                continue
            a = int(idx[bi, j])
            p = float(is_pos[bi, j])
            o = float(bce_with_logits(logits[bi, a].astype(jnp.float32),
                                      jnp.asarray(p)))
            dense_cls += o
            if p:
                t = box_ops.encode_deltas(
                    jnp.asarray(anchors[a]), matched_gt[bi, j],
                    (1.0, 1.0, 1.0, 1.0))
                dense_loc += float(
                    smooth_l1(deltas[bi, a].astype(jnp.float32), t, 0.0).sum())
    np.testing.assert_allclose(float(out["loss_rpn_cls"]),
                               dense_cls / (b * k), rtol=1e-4)
    np.testing.assert_allclose(float(out["loss_rpn_loc"]),
                               dense_loc / (b * k), rtol=1e-4)


def test_topk_smallest_with_idx_exact():
    from aldi_tpu.ops.matcher import topk_smallest_with_idx

    rng = np.random.default_rng(0)
    # large enough to trigger the segmented path (> 4*seg with seg=512)
    vals = jnp.asarray(rng.permutation(50_000).astype(np.int32))
    got_v, got_i = topk_smallest_with_idx(vals, 100, seg=512)
    np.testing.assert_array_equal(np.asarray(got_v), np.arange(100))
    np.testing.assert_array_equal(np.asarray(vals)[np.asarray(got_i)],
                                  np.arange(100))
    # small-input fallback path
    got_v2, got_i2 = topk_smallest_with_idx(vals[:600], 10, seg=512)
    want = np.sort(np.asarray(vals[:600]))[:10]
    np.testing.assert_array_equal(np.asarray(got_v2), want)


def test_subsample_indices_counts_and_composition():
    from aldi_tpu.ops.matcher import subsample_indices

    n = 20_000
    labels = np.zeros(n, np.int32)  # background
    labels[:37] = 1                 # positives
    labels[37:80] = -1              # ignored
    labels = jnp.asarray(labels)
    idx, valid, is_pos = subsample_indices(
        jax.random.PRNGKey(0), labels, 256, 0.5, bg_label=0
    )
    idx, valid, is_pos = map(np.asarray, (idx, valid, is_pos))
    assert valid.sum() == 256  # plenty of negatives to fill
    assert is_pos.sum() == 37  # all positives kept (fewer than 128)
    lab_at = np.asarray(labels)[idx]
    assert (lab_at[is_pos] == 1).all()
    neg_sel = valid & ~is_pos
    assert (lab_at[neg_sel] == 0).all()  # never samples ignored
    # positives come first
    assert is_pos[: is_pos.sum()].all()


def test_subsample_indices_no_positives():
    from aldi_tpu.ops.matcher import subsample_indices

    labels = jnp.zeros(5000, jnp.int32)
    idx, valid, is_pos = subsample_indices(
        jax.random.PRNGKey(1), labels, 128, 0.25, bg_label=0
    )
    assert int(is_pos.sum()) == 0
    assert int(valid.sum()) == 128
