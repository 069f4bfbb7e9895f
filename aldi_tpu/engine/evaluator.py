"""Detection evaluation driver.

Substrate equivalent: ``inference_on_dataset`` + ``COCOEvaluator`` as used
by the reference's eval hook and ``--eval-only`` path
(``aldi/trainer.py:166-171``, ``tools/train_net.py:67-81``). Runs jitted
inference over a TestLoader, maps canvas-space detections back to original
image coordinates (the reference's ``do_postprocess`` rescale), and scores
with the native COCO mAP implementation.
"""

import time
from collections import defaultdict
from typing import Dict

import jax
import numpy as np

from ..data.catalog import MetadataCatalog
from ..data.loader import TestLoader
from .coco_eval import evaluate_detections


PACK_WIDTH = 8


def pack_predictions(predictions: Dict[int, list]) -> "np.ndarray":
    """Flatten per-image prediction dicts into fixed-width [N, 8] rows
    (image_id hi | image_id lo | bbox xywh | score | category). The id is
    split into two f32 columns (quotient/remainder by 2^20, each exact in
    f32) because a single f32 only represents integers exactly up to 2^24
    — large COCO-style ids would silently collide after the gather. Pure;
    unit-tested against unpack as the round-trip under the multi-host
    gather."""
    rows = [
        [float(int(img_id) // (1 << 20)), float(int(img_id) % (1 << 20)),
         *d["bbox"], d["score"], float(d["category_id"])]
        for img_id, dets in predictions.items()
        for d in dets
    ]
    return np.asarray(rows, np.float32).reshape(-1, PACK_WIDTH)


def unpack_predictions(gathered: "np.ndarray",
                       counts: "np.ndarray") -> Dict[int, list]:
    """Inverse of pack over a gathered [P, cap, 8] array with ragged
    per-process row counts [P]; padding rows beyond each count are
    ignored."""
    out = defaultdict(list)
    for p in range(gathered.shape[0]):
        for row in gathered[p, : int(counts[p])]:
            img_id = int(row[0]) * (1 << 20) + int(row[1])
            out[img_id].append(
                {
                    "bbox": [float(x) for x in row[2:6]],
                    "score": float(row[6]),
                    "category_id": int(row[7]),
                }
            )
    return dict(out)


def gather_predictions(predictions: Dict[int, list]) -> Dict[int, list]:
    """All-gather per-image predictions across JAX processes so every host
    scores the full test set (reference ``COCOEvaluator(distributed=True)``
    gathers to the main process, ``aldi/helpers.py:77``).

    Predictions are packed as fixed-width rows (image_id | bbox | score |
    category) and padded to the max per-process count, then exchanged with
    ``multihost_utils.process_allgather`` over the ICI/DCN fabric."""
    if jax.process_count() == 1:
        return predictions
    from jax.experimental import multihost_utils

    local = pack_predictions(predictions)
    n = np.asarray([local.shape[0]], np.int32)
    n_all = multihost_utils.process_allgather(n).reshape(-1)
    cap = max(int(n_all.max()), 1)
    padded = np.zeros((cap, PACK_WIDTH), np.float32)
    padded[: local.shape[0]] = local
    gathered = multihost_utils.process_allgather(padded)  # [P, cap, 8]
    return unpack_predictions(gathered, n_all)


def inference_on_dataset(
    detector, variables, dataset_name: str, cfg, batch_size: int = 8,
    logger=None, distributed: bool = True, shard=None,
) -> Dict[str, float]:
    if shard is None and distributed and jax.process_count() > 1:
        shard = (jax.process_index(), jax.process_count())
    loader = TestLoader(
        dataset_name, cfg, detector.canvas, batch_size, shard=shard
    )
    md = MetadataCatalog.get(dataset_name)

    # cache the jitted inference on the detector: a fresh jax.jit wrapper
    # around a newly-bound method has an empty compilation cache, so every
    # eval period (and every test dataset) would retrace + recompile
    fwd = getattr(detector, "_jit_infer", None)
    if fwd is None:
        fwd = jax.jit(detector.forward_inference)
        detector._jit_infer = fwd

    predictions = defaultdict(list)
    n_images = 0
    t0 = time.time()
    for batch, metas in loader:
        pre_kw = {}
        if "pboxes" in batch:  # MODEL.LOAD_PROPOSALS (Fast-R-CNN inference)
            pre_kw = {"precomputed": {"boxes": batch["pboxes"],
                                      "valid": batch["pvalid"]}}
        boxes, scores, classes, valid = jax.device_get(
            fwd(variables, batch["image"], batch["sizes"], **pre_kw)
        )
        for i, meta in enumerate(metas):
            s = meta["scale"]
            for b, sc, cl, v in zip(boxes[i], scores[i], classes[i], valid[i]):
                if not v:
                    continue
                x0, y0, x1, y1 = (b / s).tolist()
                predictions[meta["image_id"]].append(
                    {
                        "bbox": [x0, y0, x1 - x0, y1 - y0],  # XYWH
                        "score": float(sc),
                        "category_id": int(cl),
                    }
                )
            n_images += 1
    infer_time = time.time() - t0
    predictions = gather_predictions(predictions)

    # ground truth in contiguous category ids
    from ..data.catalog import DatasetCatalog

    records = DatasetCatalog.get(dataset_name)
    annotations = {
        r["image_id"]: [
            {
                "bbox": a["bbox"],
                "category_id": a["category_id"],
                "iscrowd": a["iscrowd"],
                "ignore": a.get("ignore", 0),
                "area": a["area"],
            }
            for a in r["annotations"]
        ]
        for r in records
    }
    n_classes = len(md.get("thing_classes", [])) or (
        max(
            (a["category_id"] for anns in annotations.values() for a in anns),
            default=0,
        )
        + 1
    )
    results = evaluate_detections(
        dict(predictions), annotations, list(range(n_classes))
    )
    results["images_per_sec"] = n_images / max(infer_time, 1e-9)
    if logger:
        logger.info(f"[{dataset_name}] {results}")
    return results
