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


def topk_smallest_with_idx(vals: jnp.ndarray, k: int, seg: int = 2048):
    """Exact (values, indices) of the k smallest entries of a 1-D array.

    Two-stage: per-segment top-k then a top-k over the S*k candidates.
    ``lax.top_k`` over one huge row is slow on TPU (measured ~25 ms per
    765k-element call); the segmented form runs the same selection as a
    batched [S, seg] top-k plus a small merge. Exact for any k <= seg
    because a global k-smallest contains at most k entries per segment.
    """
    n = vals.shape[0]
    k = min(k, n)
    if n <= max(4 * seg, 4 * k) or k > seg:
        nv, ni = jax.lax.top_k(-vals, k)
        return -nv, ni
    pad = (-n) % seg
    if pad:
        vals = jnp.concatenate(
            [vals, jnp.full((pad,), jnp.inf, vals.dtype)
             if jnp.issubdtype(vals.dtype, jnp.floating)
             else jnp.full((pad,), jnp.iinfo(vals.dtype).max, vals.dtype)]
        )
    m = vals.shape[0] // seg
    v2 = vals.reshape(m, seg)
    nv, ni = jax.lax.top_k(-v2, k)  # [m, k] smallest per segment
    cand_v = (-nv).reshape(-1)
    cand_i = (ni + jnp.arange(m, dtype=ni.dtype)[:, None] * seg).reshape(-1)
    nv2, order = jax.lax.top_k(-cand_v, k)
    return -nv2, cand_i[order]


def subsample_indices(
    key,
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    bg_label: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``subsample_labels`` + index extraction in one pass, without any
    full-domain top-k over the N anchors beyond the two segmented selections.

    Equal in distribution to ``subsample_labels`` followed by
    ``sample_fixed_indices``: sampled positives are a uniform num_pos-subset
    of the positive candidates, negatives likewise, positives ordered first.

    Returns (indices [num_samples], valid, is_pos).
    """
    pos_mask = (labels != -1) & (labels != bg_label)
    neg_mask = labels == bg_label
    # D2 semantics: the positive cap is int(num*frac) — possibly 0 (e.g.
    # tiny num_samples or positive_fraction=0). The static top-k width
    # stays >= 1; the traced COUNT enforces the real cap.
    num_pos_cap = int(num_samples * positive_fraction)
    num_pos_max = max(num_pos_cap, 1)
    num_pos = jnp.minimum(pos_mask.sum(), num_pos_cap)
    num_neg = jnp.minimum(neg_mask.sum(), num_samples - num_pos)
    kp, kn, kt = jax.random.split(key, 3)

    big = jnp.int32(0x7FFFFFFF)

    n = labels.shape[0]

    def pick(k_rng, mask, k_max, count):
        k_eff = min(k_max, n)
        r = (jax.random.bits(k_rng, mask.shape, jnp.uint32) >> 2).astype(
            jnp.int32
        )
        masked = jnp.where(mask, r, big)
        vals, idx = topk_smallest_with_idx(masked, k_eff)
        ok = (jnp.arange(k_eff) < count) & (vals < big)
        return idx.astype(jnp.int32), ok

    ipos, vpos = pick(kp, pos_mask, num_pos_max, num_pos)
    ineg, vneg = pick(kn, neg_mask, num_samples, num_neg)

    cand_idx = jnp.concatenate([ipos, ineg])
    cand_pos = jnp.concatenate([vpos, jnp.zeros_like(vneg)])
    cand_ok = jnp.concatenate([vpos, vneg])
    score = (
        cand_pos.astype(jnp.float32) * 4.0
        + cand_ok.astype(jnp.float32) * 2.0
        + jax.random.uniform(kt, cand_idx.shape)
    )
    k_fin = min(num_samples, cand_idx.shape[0])
    svals, order = jax.lax.top_k(score, k_fin)
    out_idx, out_ok, out_pos = cand_idx[order], svals >= 2.0, svals >= 4.0
    if k_fin < num_samples:  # degenerate tiny inputs: pad invalid tail
        pad = num_samples - k_fin
        out_idx = jnp.concatenate([out_idx, jnp.zeros(pad, jnp.int32)])
        out_ok = jnp.concatenate([out_ok, jnp.zeros(pad, bool)])
        out_pos = jnp.concatenate([out_pos, jnp.zeros(pad, bool)])
    return out_idx, out_ok, out_pos


def _sample_k_of_mask(key, mask: jnp.ndarray, k, k_max: int) -> jnp.ndarray:
    """Uniformly sample ``k`` (traced, <= k_max static) True elements of
    ``mask``: keep elements whose random key is <= the k-th smallest among
    True elements. O(N log k_max) via top_k — a full argsort over e.g. 765k
    RPN anchors was the single hottest op in the train step."""
    # 30-bit keys in int32 (x64 is disabled on TPU); sentinel above range
    r = (jax.random.bits(key, mask.shape, jnp.uint32) >> 2).astype(jnp.int32)
    masked = jnp.where(mask, r, jnp.int32(0x7FFFFFFF))
    k_max = max(min(k_max, mask.shape[0]), 1)
    # select by top-k SLOT, not by value threshold: with ~N/2^30 probability
    # two keys collide at the k-th smallest value and `masked <= thr` would
    # keep k+1 elements, silently breaking the at-most-k contract (and the
    # fixed per-image loss normalizer) for that step
    vals, idx = topk_smallest_with_idx(masked, k_max)
    select = (jnp.arange(k_max) < k) & (vals < jnp.int32(0x7FFFFFFF))
    # mode="drop": the segmented top-k's padding slots carry indices >= n
    # (always with select=False, but clipping them to n-1 would make a
    # duplicate-index scatter with nondeterministic write order)
    keep = jnp.zeros(mask.shape, bool).at[idx].set(select, mode="drop")
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
