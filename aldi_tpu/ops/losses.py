"""Loss primitives shared by all detector families.

Replaces fvcore ``smooth_l1_loss``, detectron2 ``cross_entropy`` (soft-target
capable, consumed at reference ``aldi/distill.py:7-12,242``), BCE-with-logits,
sigmoid focal loss (DETR), and GIoU loss. All take explicit masks instead of
ragged filtering and return *sums*; callers normalize, matching the
reference's per-loss normalizer conventions.
"""

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 0.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (Huber). beta=0 reduces to pure L1, which is the
    reference default everywhere (``aldi/distill.py:224,269``)."""
    if beta < 1e-5:
        return jnp.abs(pred - target)
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross entropy on logits (numerically stable)."""
    # max(x,0) - x*z + log(1 + exp(-|x|))
    return (
        jnp.clip(logits, 0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def softmax_cross_entropy(
    logits: jnp.ndarray, targets: jnp.ndarray, axis: int = -1
) -> jnp.ndarray:
    """Cross entropy with either integer labels or soft target distributions.

    Returns per-row loss (no reduction).
    """
    log_probs = jax.nn.log_softmax(logits, axis=axis)
    if jnp.issubdtype(targets.dtype, jnp.integer):
        return -jnp.take_along_axis(
            log_probs, targets[..., None].astype(jnp.int32), axis=axis
        ).squeeze(axis)
    return -(targets * log_probs).sum(axis=axis)


def kl_div_log_targets(
    student_log_probs: jnp.ndarray, teacher_log_probs: jnp.ndarray
) -> jnp.ndarray:
    """KL(teacher || student) with log-space targets, per-row sum — matches
    F.kl_div(..., log_target=True) before the batchmean reduction
    (reference ``aldi/distill.py:244-247``)."""
    t = jnp.exp(teacher_log_probs)
    return (t * (teacher_log_probs - student_log_probs)).sum(axis=-1)


def sigmoid_focal(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Elementwise sigmoid focal loss (RetinaNet/DETR form)."""
    p = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def giou_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise 1 - GIoU for paired [..., 4] xyxy boxes."""
    from .boxes import box_area

    area_p = box_area(pred)
    area_t = box_area(target)
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_p + area_t - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    lt_e = jnp.minimum(pred[..., :2], target[..., :2])
    rb_e = jnp.maximum(pred[..., 2:], target[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0)
    area_e = wh_e[..., 0] * wh_e[..., 1]
    giou = iou - jnp.where(area_e > 0, (area_e - union) / area_e, 0.0)
    return 1.0 - giou


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-8):
    """Mean of `values` where mask, safe when mask is empty."""
    mask = mask.astype(values.dtype)
    return (values * mask).sum() / jnp.maximum(mask.sum(), eps)
