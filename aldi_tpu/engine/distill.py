"""Self-distillation losses (ALDIDistiller semantics, functional).

Replaces reference ``aldi/distill.py:87-278``. The reference wires teacher
and student together with forward hooks (SaveIO), a shared-torch-seed hook
(ManualSeed), and a one-shot proposal-replacement hook
(ReplaceProposalsOnce); here the DAOD train step simply:

1. runs the teacher's heads once and keeps the outputs,
2. samples ROI proposals once (student side) and feeds the same sampled set
   to both box heads,
3. calls these pure loss functions on the paired outputs.

Loss math parity map (reference lines):
- RPN objectness: BCE(student logits, sigmoid(teacher logits / OBJ_TMP))
  over the anchors sampled against pseudo-GT (``distill.py:207-216``)
- RPN regression: smooth-L1(beta 0) on fg anchors (``distill.py:219-227``)
- ROIH classification: soft CE or KL at CLS_TMP (``distill.py:240-250``)
- ROIH regression: smooth-L1 on teacher-argmax-foreground per-class deltas,
  normalized by total proposals (``distill.py:253-276``)
"""

import jax
import jax.numpy as jnp

from ..ops.losses import (
    bce_with_logits,
    kl_div_log_targets,
    masked_mean,
    smooth_l1,
    softmax_cross_entropy,
)


def rpn_distill_losses(
    student_logits: jnp.ndarray,  # [B, K] at the sampled anchors
    student_deltas: jnp.ndarray,  # [B, K, 4]
    teacher_logits: jnp.ndarray,  # [B, K]
    teacher_deltas: jnp.ndarray,  # [B, K, 4]
    valid: jnp.ndarray,  # [B, K] sampled (pos or neg) vs pseudo-GT
    fg: jnp.ndarray,  # [B, K] sampled positives
    obj_temperature: float = 1.0,
    do_obj: bool = True,
    do_reg: bool = True,
) -> dict:
    """Inputs are pre-gathered at the K anchors sampled against pseudo-GT
    (reference distills over ``label_and_sample_anchors``'s sampled set,
    ``aldi/distill.py:198-216``; means over the sampled/fg sets are
    identical to the dense masked means, without the [B, 765k] tensors)."""
    out = {}
    if do_obj:
        t_probs = jax.nn.sigmoid(teacher_logits / obj_temperature)
        obj = bce_with_logits(student_logits, t_probs)
        out["loss_obj_bce"] = masked_mean(obj, valid)
    if do_reg:
        reg = smooth_l1(student_deltas, teacher_deltas, 0.0)
        out["loss_rpn_l1"] = masked_mean(reg, fg[..., None] & jnp.ones_like(
            reg, bool))
    return out


def roih_distill_losses(
    student_cls: jnp.ndarray,  # [B, S, K+1]
    student_deltas: jnp.ndarray,  # [B, S, K*4]
    teacher_cls: jnp.ndarray,  # [B, S, K+1]
    teacher_deltas: jnp.ndarray,  # [B, S, K*4]
    sampled_valid: jnp.ndarray,  # [B, S]
    num_classes: int,
    cls_temperature: float = 1.0,
    cls_loss_type: str = "CE",
    do_cls: bool = True,
    do_reg: bool = True,
) -> dict:
    out = {}
    if do_cls:
        if cls_loss_type == "CE":
            t_probs = jax.nn.softmax(teacher_cls / cls_temperature, axis=-1)
            ce = softmax_cross_entropy(student_cls, t_probs)
            out["loss_cls_ce"] = masked_mean(ce, sampled_valid)
        elif cls_loss_type == "KL":
            kl = kl_div_log_targets(
                jax.nn.log_softmax(student_cls, axis=-1),
                jax.nn.log_softmax(teacher_cls / cls_temperature, axis=-1),
            )
            out["loss_cls_ce"] = masked_mean(kl, sampled_valid)
        else:
            raise ValueError(f"cls_loss_type must be CE or KL: {cls_loss_type}")
    if do_reg:
        fg_cls = jnp.argmax(teacher_cls, axis=-1)  # [B, S]
        fg = (fg_cls != num_classes) & sampled_valid
        idx = jnp.clip(fg_cls, 0, num_classes - 1)
        sd = student_deltas.reshape(student_deltas.shape[:-1] + (num_classes, 4))
        td = teacher_deltas.reshape(teacher_deltas.shape[:-1] + (num_classes, 4))
        sd_fg = jnp.take_along_axis(sd, idx[..., None, None], axis=-2).squeeze(-2)
        td_fg = jnp.take_along_axis(td, idx[..., None, None], axis=-2).squeeze(-2)
        reg = smooth_l1(sd_fg, td_fg, 0.0).sum(-1)
        normalizer = jnp.maximum(sampled_valid.sum(), 1)
        out["loss_roih_l1"] = (reg * fg).sum() / normalizer
    return out


def gate_hard_losses(standard_losses: dict, cfg) -> dict:
    """Keep or zero the student's standard losses on pseudo-GT according to
    the HARD_* flags (reference ``aldi/distill.py:175-186`` — zeroed losses
    are kept in the dict so optimizer/metric plumbing sees stable keys)."""
    d = cfg.DOMAIN_ADAPT.DISTILL
    keep = {
        # R-CNN keys (reference aldi/distill.py:175-180)
        "loss_cls": d.HARD_ROIH_CLS_ENABLED,
        "loss_rpn_cls": d.HARD_OBJ_ENABLED,
        "loss_rpn_loc": d.HARD_RPN_REG_ENABLED,
        "loss_box_reg": d.HARD_ROIH_REG_ENABLED,
        # YOLO keys (reference aldi/yolo/distill.py:90-94)
        "loss_obj": d.HARD_OBJ_ENABLED,
        "loss_box": d.HARD_ROIH_REG_ENABLED,
    }
    return {
        k: (v if keep.get(k, False) else v * 0.0)
        for k, v in standard_losses.items()
    }
