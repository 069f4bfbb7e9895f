"""Padded, fixed-shape non-maximum suppression for XLA/TPU.

Replaces torchvision's CUDA ``nms``/``batched_nms`` (reference substrate L0,
SURVEY.md section 2.3): RPN proposal filtering, final detection filtering, and
the teacher's pseudo-label inference all run this *inside* the jitted step.

Algorithm: exact greedy NMS via fixed-point iteration. With boxes sorted by
descending score and S[j, i] = (iou > t, j < i), greedy keep is the unique
fixed point of ``keep = valid & ~(keep @ S)``. Each iteration finalizes at
least one more prefix position, so it converges in <= N steps; in practice a
handful. Iterations are [N]x[N,N] matmuls -> MXU work, no data-dependent
shapes, fully batchable.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou


def nms_keep_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Exact greedy NMS. Returns a bool keep mask aligned with the input
    order (not sorted). boxes [N, 4], scores [N], valid [N]."""
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    # stable DESCENDING sort: among tied scores the lower-index box must be
    # processed (and kept) first, as in torchvision/detectron2 greedy NMS —
    # reversing a stable ascending sort would invert that tie-break
    order = jnp.argsort(-jnp.where(valid, scores, neg_inf))
    b = boxes[order]
    v = valid[order]

    iou = pairwise_iou(b, b)
    upper = jnp.triu(jnp.ones((n, n), bool), k=1)  # j < i (row suppresses col)
    supp = ((iou > iou_threshold) & upper & v[:, None] & v[None, :]).astype(
        jnp.float32
    )

    def cond(state):
        keep, prev, it = state
        return (it < n) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        removed = (keep.astype(jnp.float32) @ supp) > 0.0
        return v & ~removed, keep, it + 1

    keep0 = v
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0))
    )

    # scatter back to input order
    out = jnp.zeros(n, bool).at[order].set(keep)
    return out


def batched_nms_keep_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Category-aware NMS: boxes of different ``idxs`` never suppress each
    other (substrate ``batched_nms`` semantics). Implemented by offsetting
    each category into a disjoint coordinate range."""
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_keep_mask(shifted, scores, valid, iou_threshold)


@partial(jax.jit, static_argnames=("k",))
def top_k_by_score(
    boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray, k: int
):
    """Select top-k rows by score among valid ones. Returns
    (boxes [k,4], scores [k], valid [k])."""
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg_inf)
    vals, idx = jax.lax.top_k(s, k)
    return boxes[idx], vals, valid[idx] & jnp.isfinite(vals)
