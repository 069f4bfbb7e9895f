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


def test_testloader_shard_partitions(tmp_path):
    register_synthetic(os.path.join(str(tmp_path), "d2"), prefix="shardsynth")
    cfg = get_cfg()
    cfg.TPU.MAX_GT = 8
    cfg.freeze()
    from aldi_tpu.data.catalog import DatasetCatalog
    from aldi_tpu.data.loader import TestLoader

    full = [r["image_id"] for r in DatasetCatalog.get("shardsynth_val")]
    parts = []
    for rank in range(3):
        l = TestLoader("shardsynth_val", cfg, (64, 64), shard=(rank, 3))
        parts.extend(r["image_id"] for r in l.records)
    assert sorted(parts) == sorted(full)
    assert len(set(parts)) == len(full)


def test_gather_predictions_simulated_two_processes(monkeypatch):
    """Simulate 2 JAX processes: process_allgather is stubbed to append a
    second process's packed rows; the merged dict must contain both."""
    import numpy as np
    import jax as _jax
    from jax.experimental import multihost_utils
    from aldi_tpu.engine import evaluator as ev

    local = {1: [{"bbox": [1.0, 2.0, 3.0, 4.0], "score": 0.5,
                  "category_id": 2}]}
    other_rows = np.asarray(
        [[0.0, 7.0, 10.0, 20.0, 30.0, 40.0, 0.25, 1.0],
         [0.0, 1.0, 5.0, 6.0, 7.0, 8.0, 0.75, 0.0]], np.float32)

    monkeypatch.setattr(_jax, "process_count", lambda: 2)

    def fake_allgather(x):
        x = np.asarray(x)
        if x.ndim == 1:  # counts
            return np.stack([x, np.asarray([len(other_rows)], np.int32)])
        cap = x.shape[0]
        padded = np.zeros((cap, 8), np.float32)
        padded[: len(other_rows)] = other_rows[:cap]
        return np.stack([x, padded])

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    merged = ev.gather_predictions(local)
    assert len(merged[1]) == 2  # own + other process's image-1 det
    assert len(merged[7]) == 1
    scores = sorted(d["score"] for d in merged[1])
    assert scores == [0.5, 0.75]


def test_pack_unpack_predictions_roundtrip():
    """The multi-host gather's pack/unpack round-trip over a synthetic
    [P, cap, 8] gathered array with ragged per-process counts — the path
    that never executes in single-process test runs. Includes an image id
    above 2^24 (exact-integer limit of one f32): the two-column id split
    must round-trip it exactly."""
    import numpy as np

    from aldi_tpu.engine.evaluator import (
        pack_predictions, unpack_predictions,
    )

    big_id = 20000001  # f32(20000001) == f32(20000002) — collides unsplit
    preds_p0 = {
        7: [{"bbox": [1.0, 2.0, 3.0, 4.0], "score": 0.875, "category_id": 2}],
        9: [
            {"bbox": [0.0, 0.0, 5.0, 5.0], "score": 0.5, "category_id": 0},
            {"bbox": [2.0, 2.0, 2.0, 2.0], "score": 0.25, "category_id": 1},
        ],
        big_id: [{"bbox": [3.0, 3.0, 2.0, 2.0], "score": 0.625,
                  "category_id": 1}],
    }
    preds_p1 = {
        7: [{"bbox": [4.0, 4.0, 1.0, 1.0], "score": 0.75, "category_id": 2}],
        big_id + 1: [{"bbox": [1.0, 1.0, 2.0, 2.0], "score": 0.375,
                      "category_id": 0}],
    }
    preds_p2 = {}  # a process with zero predictions

    packs = [pack_predictions(p) for p in (preds_p0, preds_p1, preds_p2)]
    counts = np.asarray([p.shape[0] for p in packs], np.int32)
    cap = max(int(counts.max()), 1)
    gathered = np.zeros((3, cap, 8), np.float32)
    # poison the padding rows: unpack must ignore them
    gathered[:, :, 0] = 12345.0
    for i, p in enumerate(packs):
        gathered[i, : p.shape[0]] = p

    out = unpack_predictions(gathered, counts)
    assert set(out) == {7, 9, big_id, big_id + 1}
    assert len(out[7]) == 2 and len(out[9]) == 2
    scores7 = sorted(d["score"] for d in out[7])
    assert scores7 == [0.75, 0.875]
    assert out[big_id][0]["score"] == 0.625
    assert out[big_id + 1][0]["score"] == 0.375
    got = next(d for d in out[7] if d["score"] == 0.875)
    assert got["bbox"] == [1.0, 2.0, 3.0, 4.0] and got["category_id"] == 2
    assert 12345 not in out
