import numpy as np
import jax.numpy as jnp

from aldi_tpu.ops.nms import nms_keep_mask, batched_nms_keep_mask, top_k_by_score
from tests.test_ops_boxes import random_boxes, naive_iou


def greedy_nms_oracle(boxes, scores, valid, thresh):
    """Plain-python exact greedy NMS."""
    order = np.argsort(-scores, kind="stable")
    order = [i for i in order if valid[i]]
    keep = np.zeros(len(boxes), bool)
    iou = naive_iou(boxes, boxes)
    for i in order:
        if any(keep[j] and iou[j, i] > thresh for j in range(len(boxes)) if j != i):
            # only higher-scoring kept boxes count; keep[] only contains those
            # processed earlier (higher score), so this is the greedy rule
            continue
        keep[i] = True
    return keep


def test_nms_matches_oracle():
    rng = np.random.default_rng(3)
    for trial in range(5):
        n = 64
        boxes = random_boxes(n, size=60, rng=rng)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = rng.uniform(0, 1, n) > 0.2
        got = np.asarray(
            nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5)
        )
        want = greedy_nms_oracle(boxes, scores, valid, 0.5)
        np.testing.assert_array_equal(got, want)


def test_nms_tied_scores_keep_lower_index():
    """Among EQUAL scores the lower-index box must be processed (and kept)
    first — torchvision/detectron2 tie-break. Scores quantized to 3 levels
    force heavy ties; a reversed-ascending sort inverts the tie-break and
    keeps different boxes."""
    rng = np.random.default_rng(11)
    for trial in range(6):
        n = 64
        boxes = random_boxes(n, size=60, rng=rng)
        scores = (rng.integers(0, 3, n) / 2.0).astype(np.float32)
        valid = np.ones(n, bool)
        got = np.asarray(
            nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(valid), 0.5))
        want = greedy_nms_oracle(boxes, scores, valid, 0.5)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_nms_chain_case():
    # a suppresses b, b suppresses c, a does not suppress c -> keep a and c
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [5, 0, 15, 10], [10.5, 0, 20.5, 10]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.ones(3, bool)
    keep = np.asarray(nms_keep_mask(boxes, scores, valid, 0.3))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_batched_nms_classes_dont_interact():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    valid = jnp.ones(2, bool)
    keep_same = np.asarray(
        batched_nms_keep_mask(boxes, scores, jnp.asarray([0, 0]), valid, 0.5)
    )
    keep_diff = np.asarray(
        batched_nms_keep_mask(boxes, scores, jnp.asarray([0, 1]), valid, 0.5)
    )
    np.testing.assert_array_equal(keep_same, [True, False])
    np.testing.assert_array_equal(keep_diff, [True, True])


def test_top_k_by_score_masks_invalid():
    boxes = jnp.asarray(random_boxes(10))
    scores = jnp.arange(10, dtype=jnp.float32)
    valid = jnp.asarray([True] * 5 + [False] * 5)
    b, s, v = top_k_by_score(boxes, scores, valid, 8)
    assert int(v.sum()) == 5
    np.testing.assert_allclose(np.asarray(s[:5]), [4, 3, 2, 1, 0])
