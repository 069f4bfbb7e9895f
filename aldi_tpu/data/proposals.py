"""Precomputed-proposals support (``MODEL.LOAD_PROPOSALS``).

Substrate equivalents: ``load_proposals_into_dataset`` + the mapper-side
``transform_proposals`` (reference inherits them through D2's
``DatasetMapper.proposal_topk`` hook, ``/root/reference/aldi/dropin.py:202-208``)
and the ``PrecomputedProposals`` proposal generator (Fast-R-CNN-style
training: the detector consumes externally supplied region proposals and
runs no RPN).

TPU-first differences from the substrate:
  * static shapes — proposals are top-k'd AND padded to exactly ``topk``
    rows per image with a validity mask, so the jitted step never sees a
    data-dependent proposal count;
  * the geometric transform is pure numpy on host (same contract as GT
    boxes in ``transforms.transform_record``): crop-shift, scale, flip,
    clip, drop-empty;
  * proposals are sorted by objectness before truncation (the substrate
    assumes the file is already sorted; sorting is a no-op for files it
    would accept).

File format matches D2 proposal files so existing artifacts port over:
a pickle of ``{"ids": [...], "boxes": [per-image [N,4] XYXY_ABS],
"objectness_logits": [per-image [N]]}``.
"""

import pickle
from typing import List, Optional, Tuple

import numpy as np


def load_proposals_into_dataset(records: List[dict],
                                proposal_file: str) -> List[dict]:
    """Attach per-record ``proposal_boxes`` / ``proposal_objectness_logits``
    from a D2-format proposal pickle. Records whose image_id has no entry
    get empty arrays (valid-mask all false downstream)."""
    with open(proposal_file, "rb") as f:
        data = pickle.load(f)
    if "bbox_mode" in data:
        # D2 BoxMode.XYXY_ABS == 0; other modes never appear in shipped files
        assert int(data["bbox_mode"]) == 0, (
            f"proposal file {proposal_file}: only XYXY_ABS boxes supported "
            f"(got bbox_mode={data['bbox_mode']})"
        )
    by_id = {
        str(i): (np.asarray(b, np.float32), np.asarray(o, np.float32))
        for i, b, o in zip(data["ids"], data["boxes"],
                           data["objectness_logits"])
    }
    out = []
    for r in records:
        r = dict(r)
        boxes, logits = by_id.get(
            str(r["image_id"]),
            (np.zeros((0, 4), np.float32), np.zeros((0,), np.float32)),
        )
        r["proposal_boxes"] = boxes
        r["proposal_objectness_logits"] = logits
        out.append(r)
    return out


def transform_proposals(
    boxes: np.ndarray,
    logits: np.ndarray,
    scale: float,
    do_flip: bool,
    out_w: int,
    out_h: int,
    topk: int,
    crop_offset: Optional[Tuple[int, int]] = None,
    crop_wh: Optional[Tuple[int, int]] = None,
    min_box_size: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Original-image XYXY proposals -> padded resized-image arrays.

    Applies the SAME geometric pipeline as the GT boxes in
    ``transform_record`` (crop-shift -> scale -> flip -> clip -> drop
    empty), then keeps the top-``topk`` by objectness and pads to a static
    ``[topk, 4]`` with a validity mask. Mirrors the substrate's
    ``transform_proposals`` (clip, nonempty filter, ``[:topk]``).
    """
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4).copy()
    logits = np.asarray(logits, np.float32).reshape(-1)
    assert boxes.shape[0] == logits.shape[0]

    if crop_offset is not None:
        x0, y0 = crop_offset
        cw, ch = crop_wh
        boxes[:, 0::2] -= x0
        boxes[:, 1::2] -= y0
        # slice views (0::2 / 1::2), NOT fancy indexing: np.clip(..., out=)
        # on a fancy-indexed copy silently discards the clip
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, cw)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, ch)
    boxes *= scale
    if do_flip:
        xl = boxes[:, 0].copy()
        boxes[:, 0] = out_w - boxes[:, 2]
        boxes[:, 2] = out_w - xl
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, out_w)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, out_h)
    keep = (
        (boxes[:, 2] - boxes[:, 0] > min_box_size)
        & (boxes[:, 3] - boxes[:, 1] > min_box_size)
    )
    boxes, logits = boxes[keep], logits[keep]

    order = np.argsort(-logits, kind="stable")[:topk]
    boxes, logits = boxes[order], logits[order]

    n = boxes.shape[0]
    out_boxes = np.zeros((topk, 4), np.float32)
    out_logits = np.full((topk,), -1e9, np.float32)
    out_valid = np.zeros((topk,), bool)
    out_boxes[:n] = boxes
    out_logits[:n] = logits
    out_valid[:n] = True
    return out_boxes, out_logits, out_valid


def proposal_files_for(cfg, dataset_names, train: bool) -> List[Optional[str]]:
    """Per-dataset proposal file (or None), positionally aligned with
    ``DATASETS.TRAIN`` / ``DATASETS.TEST`` like the substrate's
    ``get_detection_dataset_dicts(proposal_files=...)``."""
    files = (
        cfg.DATASETS.PROPOSAL_FILES_TRAIN if train
        else cfg.DATASETS.PROPOSAL_FILES_TEST
    )
    if not cfg.MODEL.LOAD_PROPOSALS or not files:
        return [None] * len(dataset_names)
    assert len(files) == len(dataset_names), (
        f"PROPOSAL_FILES_{'TRAIN' if train else 'TEST'} must align 1:1 with "
        f"DATASETS.{'TRAIN' if train else 'TEST'} "
        f"(got {len(files)} files for {len(dataset_names)} datasets)"
    )
    return list(files)
