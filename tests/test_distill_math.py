"""Hand-computed checks of the distillation loss math (reference
``aldi/distill.py:193-278`` semantics) — the losses where silent AP drift
would come from."""

import numpy as np
import jax
import jax.numpy as jnp

from aldi_tpu.engine.distill import (
    gate_hard_losses,
    roih_distill_losses,
    rpn_distill_losses,
)


def sigmoid(x):
    return 1 / (1 + np.exp(-x))


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def bce_logits(logit, p):
    return np.maximum(logit, 0) - logit * p + np.log1p(np.exp(-abs(logit)))


def test_rpn_obj_distill_matches_manual():
    # 1 image, 4 anchors: labels [1, 0, -1, 0] -> valid = [T,T,F,T]
    s_logits = jnp.asarray([[0.5, -1.0, 2.0, 0.0]])
    t_logits = jnp.asarray([[1.0, -2.0, 0.0, 1.5]])
    valid = jnp.asarray([[True, True, False, True]])
    fg = jnp.asarray([[True, False, False, False]])
    out = rpn_distill_losses(
        s_logits, jnp.zeros((1, 4, 4)), t_logits, jnp.zeros((1, 4, 4)),
        valid, fg, obj_temperature=2.0, do_obj=True, do_reg=False,
    )
    t_probs = sigmoid(np.asarray(t_logits) / 2.0)
    manual = np.mean(
        [bce_logits(0.5, t_probs[0, 0]), bce_logits(-1.0, t_probs[0, 1]),
         bce_logits(0.0, t_probs[0, 3])]
    )
    np.testing.assert_allclose(float(out["loss_obj_bce"]), manual, rtol=1e-5)


def test_rpn_reg_distill_fg_only_l1():
    valid = jnp.asarray([[True, True, True, False]])
    fg = jnp.asarray([[True, False, True, False]])
    sd = jnp.asarray([[[1.0, 2, 3, 4], [9, 9, 9, 9], [0, 0, 0, 0],
                       [5, 5, 5, 5]]])
    td = jnp.asarray([[[0.0, 0, 0, 0], [1, 1, 1, 1], [1, 1, 1, 1],
                       [0, 0, 0, 0]]])
    out = rpn_distill_losses(
        jnp.zeros((1, 4)), sd, jnp.zeros((1, 4)), td, valid, fg,
        do_obj=False, do_reg=True,
    )
    # fg anchors 0 and 2; elementwise |s-t| mean over fg*4 elements
    manual = np.mean([1, 2, 3, 4, 1, 1, 1, 1])
    np.testing.assert_allclose(float(out["loss_rpn_l1"]), manual, rtol=1e-5)


def test_roih_cls_distill_soft_ce():
    k = 3  # 2 classes + bg
    s = np.asarray([[[1.0, 0.0, -1.0], [0.5, 0.5, 0.5]]], np.float32)
    t = np.asarray([[[2.0, 0.0, 0.0], [0.0, 0.0, 3.0]]], np.float32)
    valid = jnp.asarray([[True, True]])
    out = roih_distill_losses(
        jnp.asarray(s), jnp.zeros((1, 2, 8)), jnp.asarray(t),
        jnp.zeros((1, 2, 8)), valid, num_classes=2,
        cls_temperature=1.0, cls_loss_type="CE", do_cls=True, do_reg=False,
    )
    t_probs = softmax(t)
    log_s = np.log(softmax(s))
    manual = -np.sum(t_probs * log_s, -1).mean()
    np.testing.assert_allclose(float(out["loss_cls_ce"]), manual, rtol=1e-5)


def test_roih_reg_distill_teacher_argmax_foreground():
    # 2 proposals, 2 classes (+bg idx 2). proposal 0: teacher argmax class 1
    # (fg); proposal 1: argmax bg -> excluded
    t_cls = np.asarray([[[0.0, 5.0, 1.0], [0.0, 0.0, 5.0]]], np.float32)
    s_d = np.zeros((1, 2, 8), np.float32)
    t_d = np.zeros((1, 2, 8), np.float32)
    # class-1 deltas live at [4:8]
    s_d[0, 0, 4:8] = [1, 2, 3, 4]
    t_d[0, 0, 4:8] = [0, 0, 0, 0]
    s_d[0, 1, 0:4] = [9, 9, 9, 9]  # class-0 deltas of the bg proposal: unused
    valid = jnp.asarray([[True, True]])
    out = roih_distill_losses(
        jnp.zeros((1, 2, 3)), jnp.asarray(s_d), jnp.asarray(t_cls),
        jnp.asarray(t_d), valid, num_classes=2, do_cls=False, do_reg=True,
    )
    # sum |s-t| over the fg proposal's matched-class deltas / total proposals
    manual = (1 + 2 + 3 + 4) / 2.0
    np.testing.assert_allclose(float(out["loss_roih_l1"]), manual, rtol=1e-5)


def test_roih_cls_kl_variant():
    s = jnp.asarray([[[1.0, 0.0, -1.0]]])
    t = jnp.asarray([[[2.0, 0.0, 0.0]]])
    valid = jnp.asarray([[True]])
    out = roih_distill_losses(
        s, jnp.zeros((1, 1, 8)), t, jnp.zeros((1, 1, 8)), valid,
        num_classes=2, cls_temperature=2.0, cls_loss_type="KL",
        do_cls=True, do_reg=False,
    )
    tp = softmax(np.asarray(t) / 2.0)
    log_t = np.log(tp)
    log_s = np.log(softmax(np.asarray(s)))
    manual = np.sum(tp * (log_t - log_s), -1).mean()
    np.testing.assert_allclose(float(out["loss_cls_ce"]), manual, rtol=1e-5)


def test_gate_hard_losses_keys():
    from aldi_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.DOMAIN_ADAPT.DISTILL.HARD_OBJ_ENABLED = True
    losses = {
        "loss_cls": jnp.asarray(2.0),
        "loss_rpn_cls": jnp.asarray(3.0),
        "loss_rpn_loc": jnp.asarray(4.0),
        "loss_box_reg": jnp.asarray(5.0),
        "loss_obj": jnp.asarray(6.0),  # yolo key, same flag
    }
    out = gate_hard_losses(losses, cfg)
    assert float(out["loss_rpn_cls"]) == 3.0  # kept (HARD_OBJ)
    assert float(out["loss_obj"]) == 6.0
    assert float(out["loss_cls"]) == 0.0
    assert float(out["loss_box_reg"]) == 0.0
    assert set(out) == set(losses)  # zeroed keys retained


def test_auto_scale_workers():
    from aldi_tpu.config import get_cfg
    from aldi_tpu.engine.trainer import auto_scale_workers

    cfg = get_cfg()
    cfg.SOLVER.REFERENCE_WORLD_SIZE = 8
    cfg.SOLVER.IMS_PER_BATCH = 48
    cfg.SOLVER.BASE_LR = 0.06
    cfg.SOLVER.MAX_ITER = 15000
    cfg.SOLVER.STEPS = (14999,)
    out = auto_scale_workers(cfg, 16)
    assert out.SOLVER.IMS_PER_BATCH == 96
    assert abs(out.SOLVER.BASE_LR - 0.12) < 1e-9
    assert out.SOLVER.MAX_ITER == 7500
    assert out.SOLVER.REFERENCE_WORLD_SIZE == 16
    # no-op when reference world size unset
    cfg2 = get_cfg()
    assert auto_scale_workers(cfg2, 16) is cfg2


def test_fast_rcnn_losses_manual():
    """Supervised second-stage losses against manual numpy (CE mean over
    sampled, smooth-L1 beta 0 over fg matched-class deltas / total)."""
    from aldi_tpu.models.roi_heads import fast_rcnn_losses
    from aldi_tpu.ops.boxes import encode_deltas

    k = 2
    sampled = {
        "boxes": jnp.asarray([[[0.0, 0, 10, 10], [5, 5, 9, 9]]]),
        "classes": jnp.asarray([[0, 2]]),  # fg class 0, bg (=k)
        "target_boxes": jnp.asarray([[[1.0, 1, 11, 11], [0, 0, 1, 1]]]),
        "valid": jnp.asarray([[True, True]]),
        "is_pos": jnp.asarray([[True, False]]),
    }
    cls_logits = jnp.asarray([[[2.0, 0.0, 0.0], [0.0, 1.0, 1.0]]])
    deltas = jnp.zeros((1, 2, 8))
    out = fast_rcnn_losses(cls_logits, deltas, sampled, num_classes=k)

    ce = -np.log(softmax(np.asarray(cls_logits)))[0, [0, 1], [0, 2]].mean()
    np.testing.assert_allclose(float(out["loss_cls"]), ce, rtol=1e-5)

    tgt = np.asarray(
        encode_deltas(
            sampled["boxes"][0, :1], sampled["target_boxes"][0, :1],
            (10.0, 10.0, 5.0, 5.0),
        )
    )
    manual_reg = np.abs(tgt).sum() / 2  # sum |0 - tgt| over fg / num sampled
    np.testing.assert_allclose(float(out["loss_box_reg"]), manual_reg,
                               rtol=1e-5)


def test_rpn_losses_normalization():
    """RPN losses normalize by B * batch_size_per_image regardless of how
    many anchors were actually sampled."""
    from aldi_tpu.models.rpn import rpn_losses

    anchors = jnp.asarray([[0.0, 0, 10, 10], [20, 20, 30, 30],
                           [100, 100, 110, 110], [50, 50, 60, 60]])
    gt = jnp.asarray([[[0.0, 0, 10, 10]]])  # exactly matches anchor 0
    gv = jnp.ones((1, 1), bool)
    logits = jnp.zeros((1, 4))
    deltas = jnp.zeros((1, 4, 4))
    out = rpn_losses(
        jax.random.PRNGKey(0), anchors, logits, deltas, gt, gv,
        batch_size_per_image=256, positive_fraction=0.5,
    )
    # all 4 anchors sampled (well under 256): obj BCE at logit 0 is log(2)
    # per anchor -> 4 * log(2) / 256; reg: fg anchor 0 has zero target
    np.testing.assert_allclose(
        float(out["loss_rpn_cls"]), 4 * np.log(2) / 256, rtol=1e-5
    )
    np.testing.assert_allclose(float(out["loss_rpn_loc"]), 0.0, atol=1e-6)
