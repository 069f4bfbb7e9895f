"""Precomputed-proposals path (``MODEL.LOAD_PROPOSALS``).

Substrate parity: ``load_proposals_into_dataset`` + mapper-side
``transform_proposals`` + the PrecomputedProposals (Fast-R-CNN) training and
inference semantics the reference inherits through D2's
``DatasetMapper.proposal_topk`` hook (``/root/reference/aldi/dropin.py:202-208``).
"""

import json
import os
import pickle

import numpy as np
import pytest

from aldi_tpu.config import get_cfg
from aldi_tpu.data.proposals import (
    load_proposals_into_dataset,
    transform_proposals,
)
from tests.synthetic_data import register_synthetic


# ---------------------------------------------------------------- unit: math

def test_transform_proposals_scale_flip_topk_pad():
    boxes = np.array(
        [[10, 10, 30, 20], [0, 0, 4, 4], [5, 5, 5.2, 40]], np.float32
    )  # third box collapses below min size after clip/scale
    logits = np.array([1.0, 3.0, 2.0], np.float32)
    out_w, out_h, topk = 64, 48, 4
    pb, pl, pv = transform_proposals(
        boxes, logits, scale=2.0, do_flip=True, out_w=out_w, out_h=out_h,
        topk=topk,
    )
    assert pb.shape == (4, 4) and pl.shape == (4,) and pv.shape == (4,)
    # kept rows sorted by objectness desc: box1 (logit 3), box0 (logit 1);
    # box2 has width 0.4 after scale -> dropped
    assert pv.tolist() == [True, True, False, False]
    # box1 [0,0,8,8] flipped: x0 = 64-8, x1 = 64-0
    np.testing.assert_allclose(pb[0], [56, 0, 64, 8])
    # box0 [20,20,60,40] flipped: [64-60, 20, 64-20, 40]
    np.testing.assert_allclose(pb[1], [4, 20, 44, 40])
    np.testing.assert_allclose(pl[:2], [3.0, 1.0])
    assert pl[2] < -1e8  # padded logits are -inf-like


def test_transform_proposals_crop_shift():
    boxes = np.array([[10, 10, 30, 30]], np.float32)
    logits = np.array([0.5], np.float32)
    pb, _, pv = transform_proposals(
        boxes, logits, scale=1.0, do_flip=False, out_w=15, out_h=15, topk=2,
        crop_offset=(8, 8), crop_wh=(15, 15),
    )
    assert pv[0]
    np.testing.assert_allclose(pb[0], [2, 2, 15, 15])  # shifted + clipped


def test_load_proposals_missing_id_gets_empty(tmp_path):
    pf = os.path.join(str(tmp_path), "p.pkl")
    with open(pf, "wb") as f:
        pickle.dump(
            {
                "ids": [1],
                "boxes": [np.array([[0, 0, 5, 5]], np.float32)],
                "objectness_logits": [np.array([1.0], np.float32)],
                "bbox_mode": 0,
            },
            f,
        )
    recs = [{"image_id": 1}, {"image_id": 2}]
    out = load_proposals_into_dataset(recs, pf)
    assert out[0]["proposal_boxes"].shape == (1, 4)
    assert out[1]["proposal_boxes"].shape == (0, 4)
    # originals untouched (records are shared catalog state)
    assert "proposal_boxes" not in recs[0]


# ------------------------------------------------------- end-to-end training

def _write_proposal_file(records, path, seed=0):
    """GT-derived proposals (jittered GT + random negatives), D2 format."""
    rng = np.random.default_rng(seed)
    ids, boxes, logits = [], [], []
    for r in records:
        gt = np.array(
            [a["bbox"] for a in r["annotations"]], np.float32
        ).reshape(-1, 4)
        xyxy = gt.copy()
        xyxy[:, 2:] += xyxy[:, :2]
        jit = xyxy + rng.normal(0, 2.0, xyxy.shape).astype(np.float32)
        w, h = r["width"], r["height"]
        neg = np.stack(
            [
                rng.uniform(0, w * 0.6, 12),
                rng.uniform(0, h * 0.6, 12),
                rng.uniform(w * 0.4, w, 12),
                rng.uniform(h * 0.4, h, 12),
            ],
            axis=1,
        ).astype(np.float32)
        b = np.concatenate([xyxy, jit, neg])
        lg = np.concatenate(
            [
                np.full(len(xyxy), 4.0, np.float32),
                np.full(len(jit), 2.0, np.float32),
                rng.normal(-1, 0.5, len(neg)).astype(np.float32),
            ]
        )
        ids.append(r["image_id"])
        boxes.append(b)
        logits.append(lg)
    with open(path, "wb") as f:
        pickle.dump(
            {"ids": ids, "boxes": boxes, "objectness_logits": logits,
             "bbox_mode": 0},
            f,
        )


def _fast_rcnn_cfg(tmp):
    register_synthetic(os.path.join(tmp, "data"))
    from aldi_tpu.data.catalog import DatasetCatalog

    pf_train = os.path.join(tmp, "props_train.pkl")
    pf_test = os.path.join(tmp, "props_val.pkl")
    _write_proposal_file(DatasetCatalog.get("synth_train"), pf_train)
    _write_proposal_file(DatasetCatalog.get("synth_val"), pf_test, seed=1)

    cfg = get_cfg()
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.MODEL.RESNETS.DEPTH = 26
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.DATASETS.TRAIN = ("synth_train",)
    cfg.DATASETS.TEST = ("synth_val",)
    cfg.DATASETS.PROPOSAL_FILES_TRAIN = (pf_train,)
    cfg.DATASETS.PROPOSAL_FILES_TEST = (pf_test,)
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN = 24
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 16
    cfg.DATASETS.BATCH_CONTENTS = ("labeled_weak",)
    cfg.DATASETS.BATCH_RATIOS = (1,)
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.TPU.CANVAS = (128, 128)
    cfg.TPU.MAX_GT = 8
    cfg.TPU.DATA_THREADS = 2
    cfg.TPU.MESH_DATA = 1
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    cfg.TEST.EVAL_PERIOD = 0
    cfg.EMA.ENABLED = False
    cfg.OUTPUT_DIR = os.path.join(tmp, "out_fastrcnn")
    return cfg


def test_fast_rcnn_train_and_eval(tmp_path):
    """Full Fast-R-CNN loop: precomputed proposals feed training (no RPN
    losses) and evaluation (box head scores the supplied proposals)."""
    cfg = _fast_rcnn_cfg(str(tmp_path))
    cfg.freeze()

    from aldi_tpu.engine.trainer import ALDITrainer

    trainer = ALDITrainer(cfg)
    trainer.resume_or_load(resume=False)
    trainer.train()
    assert int(trainer.state.step) == 2

    with open(os.path.join(cfg.OUTPUT_DIR, "metrics.json")) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    assert rows, "no metrics written"
    loss_keys = [k for k in rows[-1] if k.startswith("loss")]
    assert loss_keys, rows[-1]
    assert not any("rpn" in k for k in loss_keys), (
        f"RPN losses present under LOAD_PROPOSALS: {loss_keys}"
    )
    assert all(np.isfinite(rows[-1][k]) for k in loss_keys)

    results = trainer.test()
    assert "bbox/AP50" in results["synth_val"]
    assert np.isfinite(results["synth_val"]["bbox/AP50"])


def test_load_proposals_rejects_da_streams(tmp_path):
    cfg = _fast_rcnn_cfg(str(tmp_path))
    cfg.DATASETS.UNLABELED = ("synth_unlabeled",)
    cfg.DATASETS.BATCH_CONTENTS = ("labeled_weak", "unlabeled_strong")
    cfg.DATASETS.BATCH_RATIOS = (1, 1)
    cfg.DOMAIN_ADAPT.DISTILL.ROIH_CLS_ENABLED = True
    cfg.freeze()
    from aldi_tpu.engine.train_step import make_train_step
    from aldi_tpu.models import build_detector

    with pytest.raises(NotImplementedError, match="supervised-only"):
        make_train_step(cfg, build_detector(cfg), tx=None)


def test_load_proposals_rejects_non_rcnn(tmp_path):
    cfg = _fast_rcnn_cfg(str(tmp_path))
    cfg.MODEL.META_ARCHITECTURE = "DeformableDETR"
    cfg.freeze()
    from aldi_tpu.models import build_detector

    with pytest.raises(NotImplementedError, match="GeneralizedRCNN"):
        build_detector(cfg)
