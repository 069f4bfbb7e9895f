"""End-to-end smoke tests: the CPU-runnable analog of the reference's
``tests/test_all_configs_cityscapes.sh`` (train a few iterations of real
configs end to end, incl. eval + checkpointing), on a synthetic dataset.
"""

import os

import numpy as np
import pytest

from aldi_tpu.config import get_cfg
from tests.synthetic_data import register_synthetic


def base_cfg(tmp, out_name):
    register_synthetic(os.path.join(tmp, "data"))
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 26
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.TPU.CANVAS = (128, 128)
    cfg.TPU.MAX_GT = 8
    cfg.TPU.DATA_THREADS = 2
    cfg.TPU.MESH_DATA = 1  # tiny batches; mesh execution covered by
    # test_graft_entry.py::test_dryrun_multichip_8_devices
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.DATASETS.TRAIN = ("synth_train",)
    cfg.DATASETS.TEST = ("synth_val",)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.CHECKPOINT_PERIOD = 3
    cfg.TEST.EVAL_PERIOD = 0
    cfg.OUTPUT_DIR = os.path.join(tmp, out_name)
    return cfg


def test_burnin_train_eval_checkpoint_resume(tmp_path):
    tmp = str(tmp_path)
    cfg = base_cfg(tmp, "out_burnin")
    cfg.DATASETS.BATCH_CONTENTS = ("labeled_strong",)
    cfg.DATASETS.BATCH_RATIOS = (1,)
    cfg.EMA.ENABLED = True
    cfg.freeze()

    from aldi_tpu.engine.trainer import ALDITrainer

    trainer = ALDITrainer(cfg)
    trainer.resume_or_load(resume=False)
    trainer.train()
    assert int(trainer.state.step) == 3
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))
    assert trainer.checkpointer.has_checkpoint()

    # eval runs and produces the substrate metric keys
    results = trainer.test()
    assert "synth_val" in results
    assert "bbox/AP50" in results["synth_val"]

    # resume restores the step counter
    trainer2 = ALDITrainer(cfg)
    trainer2.resume_or_load(resume=True)
    assert int(trainer2.state.step) == 3


def test_daod_train_smoke(tmp_path):
    tmp = str(tmp_path)
    cfg = base_cfg(tmp, "out_daod")
    cfg.DATASETS.BATCH_CONTENTS = ("labeled_strong", "unlabeled_strong")
    cfg.DATASETS.BATCH_RATIOS = (1, 1)
    cfg.DATASETS.UNLABELED = ("synth_unlabeled",)
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.EMA.ENABLED = True
    cfg.DOMAIN_ADAPT.TEACHER.ENABLED = True
    cfg.DOMAIN_ADAPT.DISTILL.ROIH_CLS_ENABLED = True
    cfg.DOMAIN_ADAPT.DISTILL.OBJ_ENABLED = True
    cfg.DOMAIN_ADAPT.DISTILL.ROIH_REG_ENABLED = True
    cfg.DOMAIN_ADAPT.DISTILL.RPN_REG_ENABLED = True
    cfg.AUG.UNLABELED_MIC_AUG = True
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 100
    cfg.freeze()

    from aldi_tpu.engine.trainer import ALDITrainer

    trainer = ALDITrainer(cfg)
    trainer.resume_or_load(resume=False)
    trainer.train()
    assert int(trainer.state.step) == 2
    sm = trainer.storage.latest()
    assert "loss_cls_ce_distill" in sm
    assert np.isfinite(sm["total_loss"])


def test_yolo_train_eval_smoke(tmp_path):
    tmp = str(tmp_path)
    cfg = base_cfg(tmp, "out_yolo")
    cfg.MODEL.META_ARCHITECTURE = "Yolo"
    cfg.MODEL.YAML = "yolov5://yolov5n.yaml"
    cfg.MODEL.YOLO.NUM_CLASSES = 3
    cfg.MODEL.PIXEL_MEAN = [0.0, 0.0, 0.0]
    cfg.MODEL.PIXEL_STD = [255.0, 255.0, 255.0]
    cfg.DATASETS.BATCH_CONTENTS = ("labeled_strong",)
    cfg.DATASETS.BATCH_RATIOS = (1,)
    cfg.EMA.ENABLED = True
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    cfg.freeze()

    from aldi_tpu.engine.trainer import ALDITrainer

    trainer = ALDITrainer(cfg)
    trainer.resume_or_load(resume=False)
    trainer.train()
    assert int(trainer.state.step) == 2
    # BN stats live in state and eval (teacher, running-average mode) works
    assert "batch_stats" in trainer.state.model_state
    results = trainer.test()
    assert "bbox/AP50" in results["synth_val"]


def test_detr_train_eval_smoke(tmp_path):
    tmp = str(tmp_path)
    cfg = base_cfg(tmp, "out_detr")
    cfg.MODEL.META_ARCHITECTURE = "DeformableDETR"
    cfg.MODEL.PIXEL_MEAN = [123.675, 116.280, 103.530]
    cfg.MODEL.PIXEL_STD = [58.395, 57.120, 57.375]
    dd = cfg.MODEL.DEFORMABLE_DETR
    dd.NUM_CLASSES = 3
    dd.TRANSFORMER.ENC_LAYERS = 1
    dd.TRANSFORMER.DEC_LAYERS = 1
    dd.TRANSFORMER.NUM_QUERIES = 10
    dd.TRANSFORMER.HIDDEN_DIM = 32
    dd.TRANSFORMER.DIM_FEEDFORWARD = 64
    dd.TRANSFORMER.NHEADS = 2
    cfg.DATASETS.BATCH_CONTENTS = ("labeled_strong",)
    cfg.DATASETS.BATCH_RATIOS = (1,)
    cfg.EMA.ENABLED = True
    cfg.SOLVER.OPTIMIZER = "ADAMW"
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    cfg.freeze()

    from aldi_tpu.engine.trainer import ALDITrainer

    trainer = ALDITrainer(cfg)
    trainer.resume_or_load(resume=False)
    trainer.train()
    assert int(trainer.state.step) == 2
    results = trainer.test()
    assert "bbox/AP50" in results["synth_val"]
