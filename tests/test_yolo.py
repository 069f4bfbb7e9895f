import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aldi_tpu.config import get_cfg
from aldi_tpu.engine import create_train_state, make_train_step
from aldi_tpu.models import build_detector
from aldi_tpu.models.yolo import (
    ANCHORS,
    STRIDES,
    build_targets,
    ciou,
    decode_predictions,
)
from aldi_tpu.structures import Instances
from tests.test_rcnn_forward import tiny_batch


def yolo_cfg(**overrides):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "Yolo"
    cfg.MODEL.YAML = "yolov5://yolov5n.yaml"  # smallest variant for tests
    cfg.MODEL.YOLO.NUM_CLASSES = 3
    cfg.MODEL.PIXEL_MEAN = [0.0, 0.0, 0.0]
    cfg.MODEL.PIXEL_STD = [255.0, 255.0, 255.0]
    cfg.TPU.CANVAS = (128, 128)
    cfg.TPU.MAX_GT = 8
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.WARMUP_ITERS = 0
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def test_build_targets_center_and_neighbors():
    # one gt at grid (4.3, 6.7) on P3 (stride 8): cells (4,6), x-neigh 3
    # (fx<0.5), y-neigh 7 (fy>0.5)
    boxes = jnp.asarray([[[4.3 * 8 - 20, 6.7 * 8 - 20, 4.3 * 8 + 20,
                           6.7 * 8 + 20]]])  # 40px box, matches small anchors
    classes = jnp.asarray([[1]])
    valid = jnp.asarray([[True]])
    t = build_targets(boxes, classes, valid, [(16, 16), (8, 8), (4, 4)])
    lvl0 = t[0]
    # anchor (33, 23)/8 = (4.1, 2.9) vs wh (5, 5) grid -> ratio < 4 ok
    assert bool(lvl0["valid"].any())
    # candidate cells for any valid anchor
    a = int(np.argmax(np.asarray(lvl0["valid"][0, 0, :, 0])))
    np.testing.assert_array_equal(
        np.asarray(lvl0["ci"][0, 0, a]), [4, 3, 4]
    )
    np.testing.assert_array_equal(
        np.asarray(lvl0["cj"][0, 0, a]), [6, 6, 7]
    )


def test_ciou_perfect_match():
    b = jnp.asarray([5.0, 5.0, 4.0, 2.0])
    np.testing.assert_allclose(float(ciou(b, b)), 1.0, atol=1e-5)
    b2 = jnp.asarray([50.0, 50.0, 4.0, 2.0])
    assert float(ciou(b, b2)) < 0  # far apart -> negative CIoU


def test_yolo_forward_train_and_inference():
    cfg = yolo_cfg()
    cfg.freeze()
    det = build_detector(cfg)
    assert det.mutable_collections == ("batch_stats",)
    variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    assert "batch_stats" in variables
    images, sizes, gt = tiny_batch()

    losses, aux = jax.jit(
        lambda v, im, sz, g, r: det.forward_train(v, im, sz, g, r)
    )(variables, images, sizes, gt, jax.random.PRNGKey(1))
    for k in ("loss_box", "loss_obj", "loss_cls"):
        assert np.isfinite(float(losses[k])), k
    assert "batch_stats" in aux["mutated_vars"]
    # stats actually moved
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(aux["mutated_vars"]["batch_stats"])
    assert any(
        float(jnp.abs(a - b).max()) > 0 for a, b in zip(old, new)
    )

    boxes, scores, classes, valid = jax.jit(det.forward_inference)(
        variables, images, sizes
    )
    assert boxes.shape == (2, 10, 4)


def test_yolo_daod_train_step():
    cfg = yolo_cfg(**{
        "DATASETS.BATCH_CONTENTS": ("labeled_strong", "unlabeled_strong"),
        "DATASETS.BATCH_RATIOS": (1, 1),
        "DATASETS.UNLABELED": ("fake",),
        "EMA.ENABLED": True,
        "DOMAIN_ADAPT.TEACHER.THRESHOLD": 0.0,
        "DOMAIN_ADAPT.DISTILL.ROIH_CLS_ENABLED": True,
        "DOMAIN_ADAPT.DISTILL.OBJ_ENABLED": True,
        "DOMAIN_ADAPT.DISTILL.ROIH_REG_ENABLED": True,
        "DOMAIN_ADAPT.DISTILL.RPN_REG_ENABLED": False,  # N/A for YOLO
        "SOLVER.CLIP_GRADIENTS.ENABLED": True,
        "SOLVER.CLIP_GRADIENTS.CLIP_TYPE": "norm",
        "SOLVER.CLIP_GRADIENTS.CLIP_VALUE": 1.0,
    })
    cfg.freeze()
    det = build_detector(cfg)
    state, tx = create_train_state(cfg, det, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, det, tx)

    from tests.test_train_step import make_batch

    batch = make_batch(with_unlabeled=True)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(5))
    for k in (
        "loss_box_source_strong",
        "loss_soft_obj_distill",
        "loss_soft_cls_distill",
        "loss_soft_reg_distill",
        "loss_box_distill",  # hard, gated to zero
    ):
        assert k in metrics, sorted(metrics)
        assert np.isfinite(float(metrics[k])), k
    assert float(metrics["loss_box_distill"]) == 0.0
    # BN stats tracked in state and EMA'd
    assert state.model_state and "batch_stats" in state.model_state
    assert state.ema_model_state is not None
    state2, _ = step_fn(state, batch, jax.random.PRNGKey(6))
    assert int(state2.step) == 2


def test_yolo_sync_bn_full_model_matches_global_batch():
    """Full-model sync-BN semantics: one sharded YOLO DAOD step over the
    8-device mesh produces the same batch_stats as the identical global
    batch on a 1-device mesh (slow tier; the driver dryrun carries the
    cheap standalone-BatchNorm proof instead, __graft_entry__.py).

    Reference divergence under test: docs/DIVERGENCES.md — the reference
    keeps rank-local BN buffers (aldi/dropin.py:53 broadcast_buffers=False);
    under jit with the batch sharded on the data axis, nn.BatchNorm reduces
    over the GLOBAL batch."""
    import jax.tree_util as jtu

    import __graft_entry__ as ge

    state_n, metrics_n, _ = ge._run_sharded_step(ge._yolo_cfg(), 8)
    state_1, metrics_1, _ = ge._run_sharded_step(ge._yolo_cfg(), 1,
                                                 batch_size=8)
    bs_n = jax.device_get(state_n.model_state["batch_stats"])
    bs_1 = jax.device_get(state_1.model_state["batch_stats"])
    diffs = jtu.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b))
                                  / (np.abs(np.asarray(a)) + 1e-3))),
        bs_n, bs_1,
    )
    worst = max(jtu.tree_leaves(diffs))
    assert worst < 1e-3, f"sync-BN: batch_stats diverged by {worst}"
    ge._per_loss_close(metrics_1, metrics_n, "yolo-sharded-vs-global")
