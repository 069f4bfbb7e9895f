"""Evaluator integration: canvas->original coordinate mapping and metric
keys, using a detector stub so no model inference is involved."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from aldi_tpu.config import get_cfg
from aldi_tpu.engine.evaluator import inference_on_dataset
from tests.synthetic_data import register_synthetic


class StubDetector:
    """Returns each image's GT boxes (in canvas coords) as detections with
    score 0.9 -> the evaluator must score AP50 = 100 if and only if its
    scale-back mapping is correct."""

    def __init__(self, cfg, canvas, gt_lookup):
        self.cfg = cfg
        self.canvas = canvas
        self._gt = gt_lookup  # image_id -> (boxes_canvas, classes) in order

    def forward_inference(self, variables, images, sizes):
        b = images.shape[0]
        d = 10
        boxes = np.zeros((b, d, 4), np.float32)
        scores = np.zeros((b, d), np.float32)
        classes = np.zeros((b, d), np.int32)
        valid = np.zeros((b, d), bool)
        for i in range(b):
            key = self._order.pop(0) if self._order else None
            if key is None:
                continue
            gb, gc = self._gt[key]
            n = min(len(gb), d)
            boxes[i, :n] = gb[:n]
            classes[i, :n] = gc[:n]
            scores[i, :n] = 0.9
            valid[i, :n] = True
        return (jnp.asarray(boxes), jnp.asarray(scores),
                jnp.asarray(classes), jnp.asarray(valid))


def test_evaluator_scale_mapping_perfect_ap(tmp_path):
    register_synthetic(os.path.join(str(tmp_path), "data"), prefix="evalsynth")
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 100
    cfg.TPU.CANVAS = (128, 128)
    cfg.TPU.MAX_GT = 8
    cfg.freeze()

    from aldi_tpu.data.catalog import DatasetCatalog
    from aldi_tpu.data.loader import TestLoader

    records = DatasetCatalog.get("evalsynth_val")
    # build canvas-space GT per image by replaying the eval transform
    gt_lookup = {}
    order = []
    for r in records:
        scale = min(64 / min(r["height"], r["width"]),
                    100 / max(r["height"], r["width"]))
        boxes, classes = [], []
        for a in r["annotations"]:
            x, y, w, h = a["bbox"]
            boxes.append([x * scale, y * scale, (x + w) * scale,
                          (y + h) * scale])
            classes.append(a["category_id"])
        gt_lookup[r["image_id"]] = (np.asarray(boxes), np.asarray(classes))
        order.append(r["image_id"])

    # single batch: the evaluator jits forward_inference, so the stub's
    # trace-time constants must cover the whole dataset in one call
    det = StubDetector(cfg, (128, 128), gt_lookup)
    det._order = list(order)
    results = inference_on_dataset(det, {}, "evalsynth_val", cfg,
                                   batch_size=len(records))
    assert results["bbox/AP50"] > 99.0, results
    assert results["bbox/AP"] > 95.0, results
    assert "images_per_sec" in results
