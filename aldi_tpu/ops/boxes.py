"""Box geometry ops: area, IoU, clipping, delta encode/decode.

Replaces the slice of ``detectron2.structures.Boxes`` +
``detectron2.modeling.box_regression.Box2BoxTransform`` consumed by the
reference R-CNN path (see SURVEY.md section 2.2). All functions are pure,
shape-polymorphic over leading dims, and mask-aware where it matters.

Boxes are XYXY absolute pixel coordinates.
"""

import math

import jax.numpy as jnp

# Clamp on predicted dw/dh, matching the reference substrate's
# Box2BoxTransform scale clamp of log(1000/16).
_SCALE_CLAMP = math.log(1000.0 / 16)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [..., 4] xyxy boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between [..., N, 4] and [..., M, 4] -> [..., N, M]."""
    area1 = box_area(boxes1)  # [..., N]
    area2 = box_area(boxes2)  # [..., M]
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]  # [..., N, M]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def pairwise_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Generalized IoU matrix [..., N, M] (used by the DETR matcher/losses)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    # smallest enclosing box
    lt_e = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb_e = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0)
    area_e = wh_e[..., 0] * wh_e[..., 1]
    return iou - jnp.where(area_e > 0, (area_e - union) / area_e, 0.0)


def clip_boxes(boxes: jnp.ndarray, hw) -> jnp.ndarray:
    """Clip [..., 4] boxes to [0, w] x [0, h]. `hw` is (h, w), scalars or
    arrays broadcastable against the leading dims."""
    h, w = hw
    x0 = jnp.clip(boxes[..., 0], 0, w)
    y0 = jnp.clip(boxes[..., 1], 0, h)
    x1 = jnp.clip(boxes[..., 2], 0, w)
    y1 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    return ((boxes[..., 2] - boxes[..., 0]) > threshold) & (
        (boxes[..., 3] - boxes[..., 1]) > threshold
    )


def encode_deltas(src: jnp.ndarray, target: jnp.ndarray, weights) -> jnp.ndarray:
    """(dx, dy, dw, dh) deltas transforming `src` boxes into `target` boxes.

    Matches Box2BoxTransform.get_deltas semantics; `weights` is a 4-tuple
    (wx, wy, ww, wh).
    """
    wx, wy, ww, wh = weights
    src_w = src[..., 2] - src[..., 0]
    src_h = src[..., 3] - src[..., 1]
    src_cx = src[..., 0] + 0.5 * src_w
    src_cy = src[..., 1] + 0.5 * src_h
    tgt_w = target[..., 2] - target[..., 0]
    tgt_h = target[..., 3] - target[..., 1]
    tgt_cx = target[..., 0] + 0.5 * tgt_w
    tgt_cy = target[..., 1] + 0.5 * tgt_h
    # guard padding boxes (zero size) against division by zero / log(0)
    safe_w = jnp.where(src_w > 0, src_w, 1.0)
    safe_h = jnp.where(src_h > 0, src_h, 1.0)
    dx = wx * (tgt_cx - src_cx) / safe_w
    dy = wy * (tgt_cy - src_cy) / safe_h
    dw = ww * jnp.log(jnp.maximum(tgt_w, 1e-6) / safe_w)
    dh = wh * jnp.log(jnp.maximum(tgt_h, 1e-6) / safe_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_deltas(deltas: jnp.ndarray, boxes: jnp.ndarray, weights) -> jnp.ndarray:
    """Apply (dx, dy, dw, dh) deltas to boxes (Box2BoxTransform.apply_deltas).

    `deltas` is [..., 4] or [..., K*4] paired with [..., 4] boxes; in the
    latter case the output is [..., K*4].
    """
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * widths
    cy = boxes[..., 1] + 0.5 * heights

    shape = deltas.shape
    d = deltas.reshape(shape[:-1] + (-1, 4))
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.clip(d[..., 2] / ww, None, _SCALE_CLAMP)
    dh = jnp.clip(d[..., 3] / wh, None, _SCALE_CLAMP)

    pred_cx = dx * widths[..., None] + cx[..., None]
    pred_cy = dy * heights[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
    return out.reshape(shape)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([x, y, x + w, y + h], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
