"""Anchor/proposal matching and balanced subsampling.

Functional equivalents of the substrate's ``Matcher`` and
``subsample_labels`` as consumed by the reference RPN/ROI-head training paths
and explicitly re-invoked by the distiller
(``label_and_sample_anchors``, reference ``aldi/distill.py:198-204``).

All functions take explicit PRNG keys — this replaces the reference's
``ManualSeed`` forward-pre-hook trick (``aldi/helpers.py:17-26``) for keeping
teacher/student sampling identical: callers simply pass the same key.
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def match(
    iou: jnp.ndarray,
    gt_valid: jnp.ndarray,
    thresholds: Sequence[float],
    labels: Sequence[int],
    allow_low_quality: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match N predictions to M (padded) ground-truth boxes.

    Args:
      iou: [N, M] IoU between predictions and gt.
      gt_valid: [M] bool mask of real gt rows.
      thresholds/labels: Matcher intervals, e.g. RPN ([0.3, 0.7], [0, -1, 1]);
        label -1 = ignore.
      allow_low_quality: also mark, for each gt, its highest-IoU predictions
        as positive (RPN behavior).

    Returns:
      matched_idx: [N] int32 index into gt (argmax, valid gt only).
      match_labels: [N] int8 in {-1, 0, 1}.
    """
    neg_inf = jnp.asarray(-1.0, iou.dtype)
    iou = jnp.where(gt_valid[None, :], iou, neg_inf)  # [N, M]
    matched_vals = iou.max(axis=1)
    matched_idx = iou.argmax(axis=1).astype(jnp.int32)

    match_labels = jnp.full(matched_vals.shape, labels[0], jnp.int8)
    for lo, lab in zip(thresholds, labels[1:]):
        match_labels = jnp.where(matched_vals >= lo, jnp.int8(lab), match_labels)
    # no valid gt at all -> everything is background (matched_vals == -1 < t0)

    if allow_low_quality:
        # per-gt best IoU (over preds); every pred achieving it becomes fg
        best_per_gt = iou.max(axis=0)  # [M]
        is_best = (iou == best_per_gt[None, :]) & gt_valid[None, :] & (
            best_per_gt[None, :] > 0
        )
        match_labels = jnp.where(is_best.any(axis=1), jnp.int8(1), match_labels)

    return matched_idx, match_labels


def _sample_k_of_mask(key, mask: jnp.ndarray, k, k_max: int) -> jnp.ndarray:
    """Uniformly sample ``k`` (traced, <= k_max static) True elements of
    ``mask``: keep elements whose random key is <= the k-th smallest among
    True elements. O(N log k_max) via top_k — a full argsort over e.g. 765k
    RPN anchors was the single hottest op in the train step."""
    # 30-bit keys in int32 (x64 is disabled on TPU); sentinel above range
    r = (jax.random.bits(key, mask.shape, jnp.uint32) >> 2).astype(jnp.int32)
    masked = jnp.where(mask, r, jnp.int32(0x7FFFFFFF))
    k_max = max(min(k_max, mask.shape[0]), 1)
    # k_max smallest values, ascending
    smallest = -jax.lax.top_k(-masked, k_max)[0]
    thr = smallest[jnp.clip(k - 1, 0, k_max - 1)]
    keep = mask & (masked <= thr)
    return keep & (k > 0)


def subsample_labels(
    key,
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    bg_label: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomly keep at most ``num_samples`` elements split pos/neg.

    Matches the substrate's ``subsample_labels``: positives = not ignore and
    not background; sample min(#pos, num_samples*fraction) positives, fill the
    remainder (capped by #neg) with negatives.

    Returns (sampled_pos, sampled_neg) boolean masks.
    """
    pos_mask = (labels != -1) & (labels != bg_label)
    neg_mask = labels == bg_label
    num_pos_max = int(num_samples * positive_fraction)
    num_pos = jnp.minimum(pos_mask.sum(), num_pos_max)
    num_neg = jnp.minimum(neg_mask.sum(), num_samples - num_pos)
    kp, kn = jax.random.split(key)
    sampled_pos = _sample_k_of_mask(kp, pos_mask, num_pos, num_pos_max)
    sampled_neg = _sample_k_of_mask(kn, neg_mask, num_neg, num_samples)
    return sampled_pos, sampled_neg


def sample_fixed_indices(
    key, sampled_pos: jnp.ndarray, sampled_neg: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Turn pos/neg sample masks over N elements into exactly-k indices.

    Returns (indices [k], valid [k], is_pos [k]). When fewer than k elements
    were sampled the tail is marked invalid (rare: happens only when an image
    has almost no background candidates).
    """
    r = jax.random.uniform(key, sampled_pos.shape)
    score = sampled_pos * 4.0 + sampled_neg * 2.0 + r
    vals, idx = jax.lax.top_k(score, k)
    return idx.astype(jnp.int32), vals >= 2.0, vals >= 4.0
