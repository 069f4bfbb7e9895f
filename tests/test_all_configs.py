"""Config-corpus smoke test: every generated benchmark YAML must load,
resolve a canvas, and build its detector + optimizer, and every unique
(META_ARCHITECTURE, BATCH_CONTENTS, align/distill flags, OPTIMIZER)
equivalence class across the corpus must run ONE jitted train step — the
CPU analog of the reference's ``tests/test_all_configs_cityscapes.sh:22``
(1-iter run of every config) without its GPU/checkpoint/data needs."""

import glob
import os

import jax
import numpy as np
import pytest

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_CONFIGS = sorted(
    os.path.relpath(p, CONFIG_ROOT)
    for p in glob.glob(os.path.join(CONFIG_ROOT, "**", "*.yaml"),
                       recursive=True)
)


def _load(rel):
    from aldi_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_ROOT, rel))
    return cfg


def _class_key(cfg):
    d = cfg.DOMAIN_ADAPT.DISTILL
    a = cfg.DOMAIN_ADAPT.ALIGN
    return (
        cfg.MODEL.META_ARCHITECTURE,
        tuple(cfg.DATASETS.BATCH_CONTENTS),
        a.IMG_DA_ENABLED, a.INS_DA_ENABLED,
        (d.ROIH_CLS_ENABLED, d.ROIH_REG_ENABLED, d.OBJ_ENABLED,
         d.RPN_REG_ENABLED, d.HARD_ROIH_CLS_ENABLED,
         d.HARD_ROIH_REG_ENABLED, d.HARD_OBJ_ENABLED,
         d.HARD_RPN_REG_ENABLED),
        cfg.SOLVER.OPTIMIZER, cfg.EMA.ENABLED,
    )


def _collect_class_representatives():
    """One representative YAML per protocol equivalence class; prefer the
    cheapest backbone (CPU compile time) since the class is about stream
    composition + loss wiring, not backbone depth."""
    pref = {"build_resnet_fpn_backbone": 0, "build_convnext_fpn_backbone": 1}
    best = {}
    for rel in ALL_CONFIGS:
        cfg = _load(rel)
        key = _class_key(cfg)
        rank = pref.get(cfg.MODEL.BACKBONE.NAME, 2)
        if key not in best or rank < best[key][0]:
            best[key] = (rank, rel)
    return sorted(rel for _, rel in best.values())


CLASS_REPRESENTATIVES = _collect_class_representatives()


def test_corpus_is_complete():
    # 7 base + 1 vendored-d2 + 18 cityscapes + 5 sim10k + 5 cfc
    assert len(ALL_CONFIGS) >= 36, ALL_CONFIGS


@pytest.mark.parametrize("rel", ALL_CONFIGS)
def test_config_builds_detector_and_optimizer(rel):
    from aldi_tpu.config import get_cfg
    from aldi_tpu.models import build_detector
    from aldi_tpu.solver import build_lr_schedule

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_ROOT, rel))
    # shrink static shapes so construction stays cheap (no jit here)
    cfg.TPU.CANVAS = (64, 64)
    cfg.TPU.MAX_GT = 4
    cfg.freeze()
    det = build_detector(cfg)
    assert det.canvas == (64, 64)
    assert det.num_classes > 0
    sched = build_lr_schedule(cfg)
    lr0 = float(sched(0))
    lr_end = float(sched(cfg.SOLVER.MAX_ITER - 1))
    assert lr0 > 0 and lr_end >= 0


def _shrink_for_step(cfg):
    cfg.TPU.CANVAS = (64, 64)
    cfg.TPU.MAX_GT = 4
    cfg.TPU.GRAD_ACCUM = 1
    cfg.SOLVER.IMS_PER_BATCH = len(cfg.DATASETS.BATCH_CONTENTS)
    cfg.SOLVER.BASE_LR = min(cfg.SOLVER.BASE_LR, 1e-3)
    cfg.SOLVER.WARMUP_ITERS = 0
    if cfg.MODEL.META_ARCHITECTURE == "GeneralizedRCNN":
        # the class is about stream composition + loss wiring; depth only
        # costs CPU compile time
        if cfg.MODEL.BACKBONE.NAME == "build_resnet_fpn_backbone":
            cfg.MODEL.RESNETS.DEPTH = 26
        if cfg.MODEL.BACKBONE.NAME == "build_convnext_fpn_backbone":
            cfg.MODEL.CONVNEXT.DEPTHS = [1, 1, 1, 1]
        cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
        cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
        cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
        cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
        cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    if cfg.MODEL.META_ARCHITECTURE == "DeformableDETR":
        t = cfg.MODEL.DEFORMABLE_DETR.TRANSFORMER
        t.NUM_QUERIES = min(t.NUM_QUERIES, 50)
    cfg.TEST.DETECTIONS_PER_IMAGE = 5
    return cfg


@pytest.mark.parametrize("rel", CLASS_REPRESENTATIVES)
def test_config_class_runs_one_jitted_step(rel):
    """One jitted train_step per protocol class (config-specific stream
    compositions like OracleST / ALDI-Yolo align wiring compile + step,
    not just build)."""
    from __graft_entry__ import _fake_batch
    from aldi_tpu.engine import create_train_state, make_train_step
    from aldi_tpu.models import build_detector

    cfg = _shrink_for_step(_load(rel))
    cfg.freeze()
    det = build_detector(cfg)
    state, tx = create_train_state(cfg, det, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, det, tx)

    with_unlabeled = (
        any(s.startswith("unlabeled") for s in cfg.DATASETS.BATCH_CONTENTS)
        and len(cfg.DATASETS.UNLABELED) > 0
    )
    batch = _fake_batch(1, det.canvas, cfg.TPU.MAX_GT, with_unlabeled)
    # fake batch uses class ids {0}; valid for every corpus NUM_CLASSES
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    total = float(jax.device_get(metrics["total_loss"]))
    assert np.isfinite(total), (rel, total)
    assert int(jax.device_get(state.step)) == 1
