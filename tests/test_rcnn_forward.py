import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aldi_tpu.config import get_cfg
from aldi_tpu.models import build_detector
from aldi_tpu.structures import Instances


def tiny_cfg(**overrides):
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.RESNETS.DEPTH = 26  # 1 block/stage test variant
    cfg.TPU.CANVAS = (128, 128)
    cfg.TPU.MAX_GT = 8
    # shrink proposal counts so CPU tests are fast
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def tiny_batch(b=2, n_gt=3, canvas=(128, 128)):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (b, *canvas, 3)).astype(np.float32)
    sizes = np.tile([[canvas[0], canvas[1]]], (b, 1)).astype(np.int32)
    boxes = np.zeros((b, 8, 4), np.float32)
    classes = np.zeros((b, 8), np.int32)
    valid = np.zeros((b, 8), bool)
    for i in range(b):
        for g in range(n_gt):
            x0, y0 = rng.uniform(0, 80, 2)
            w, h = rng.uniform(10, 40, 2)
            boxes[i, g] = [x0, y0, x0 + w, y0 + h]
            classes[i, g] = rng.integers(0, 3)
            valid[i, g] = True
    gt = Instances(
        boxes=jnp.asarray(boxes), classes=jnp.asarray(classes),
        valid=jnp.asarray(valid), scores=jnp.zeros((b, 8)),
    )
    return jnp.asarray(images), jnp.asarray(sizes), gt


@pytest.fixture(scope="module")
def detector_and_vars():
    cfg = tiny_cfg()
    det = build_detector(cfg)
    variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    return det, variables


@pytest.fixture(scope="module")
def jitted(detector_and_vars):
    det, _ = detector_and_vars
    fwd_train = jax.jit(
        lambda v, im, sz, gt, rng: det.forward_train(v, im, sz, gt, rng)
    )
    fwd_inf = jax.jit(det.forward_inference)
    return fwd_train, fwd_inf


def test_init_param_shapes(detector_and_vars):
    det, variables = detector_and_vars
    assert "params" in variables and "frozen" in variables
    flat = jax.tree_util.tree_leaves(variables["params"])
    n_params = sum(x.size for x in flat)
    # tiny R26-FPN + RPN + box head; full R50 adds ~14M more
    assert 15e6 < n_params < 60e6, n_params


def test_forward_train_losses(detector_and_vars, jitted):
    det, variables = detector_and_vars
    fwd_train, _ = jitted
    images, sizes, gt = tiny_batch()
    losses, aux = fwd_train(variables, images, sizes, gt, jax.random.PRNGKey(1))
    for k in ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"):
        assert k in losses
        v = float(losses[k])
        assert np.isfinite(v) and v >= 0, (k, v)
    # aux carries distillation intermediates
    assert aux["rpn_logits"].shape[0] == 2
    assert aux["roih_cls_logits"].shape == (2, 16, 4)
    assert aux["roih_deltas"].shape == (2, 16, 12)


def test_forward_train_differentiable(detector_and_vars):
    det, variables = detector_and_vars
    images, sizes, gt = tiny_batch()

    def loss_fn(params):
        v = {**variables, "params": params}
        losses, _ = det.forward_train(
            v, images, sizes, gt, jax.random.PRNGKey(1)
        )
        return sum(losses.values())

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    gnorm = jnp.sqrt(
        sum(jnp.sum(g.astype(jnp.float32) ** 2)
            for g in jax.tree_util.tree_leaves(grads))
    )
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
    # frozen stages receive zero gradient (FREEZE_AT=2)
    stem = grads["backbone"]["stem_conv1"]["kernel"]
    assert float(jnp.abs(stem).max()) == 0.0
    res2 = grads["backbone"]["res2_block0"]["conv1"]["kernel"]
    assert float(jnp.abs(res2).max()) == 0.0
    res3 = grads["backbone"]["res3_block0"]["conv1"]["kernel"]
    assert float(jnp.abs(res3).max()) > 0.0


def test_forward_inference_shapes(detector_and_vars, jitted):
    det, variables = detector_and_vars
    _, fwd_inf = jitted
    images, sizes, _ = tiny_batch()
    boxes, scores, classes, valid = fwd_inf(variables, images, sizes)
    assert boxes.shape == (2, 10, 4)
    assert scores.shape == (2, 10)
    assert classes.shape == (2, 10)
    assert valid.dtype == jnp.bool_


def test_align_losses_present():
    cfg = tiny_cfg(**{
        "DOMAIN_ADAPT.ALIGN.IMG_DA_ENABLED": True,
        "DOMAIN_ADAPT.ALIGN.INS_DA_ENABLED": True,
    })
    det = build_detector(cfg)
    variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    images, sizes, gt = tiny_batch()
    losses, _ = jax.jit(
        lambda v, im, sz, g, r: det.forward_train(
            v, im, sz, g, r, do_align=True, domain_label=0.0
        )
    )(variables, images, sizes, gt, jax.random.PRNGKey(1))
    assert "loss_da_img" in losses and "loss_da_ins" in losses
    assert float(losses["loss_da_img"]) > 0
