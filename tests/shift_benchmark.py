"""Synthetic domain-shift benchmark for end-to-end DAOD efficacy runs.

The reference's core claim is that ALDI++ improves *target-domain* AP over
source-only training (``/root/reference/README.md:89-93``; protocol burn-in
-> DA, ``/root/reference/docs/TRAINING.md:11-25``). Real Cityscapes->Foggy
data is unavailable offline, so this fixture reproduces the *structure* of
that benchmark synthetically:

- source domain: shape-coded objects (0=filled rect, 1=ring, 2=cross) in
  bright colors on dark noise. Class identity is carried by SHAPE, so the
  signal survives the color-jitter/grayscale strong augmentations — the same
  trick as tests/learnable_fixture.py, here materialized as COCO-format
  datasets on disk.
- target domain: the SAME generative process plus a controlled fog-like
  shift (contrast pulled toward a bright haze, Gaussian blur, a warm color
  cast, extra sensor noise) — the synthetic analog of Cityscapes->Foggy
  Cityscapes (the reference's fog rendering, ``tools/convert_cityscapes_to
  _coco.py:48-105``, is likewise a post-hoc transform of source frames).

Splits (COCO json + PNGs, registered in the DatasetCatalog):
    shift_src_train   labeled source training images
    shift_src_val     source validation (sanity: burn-in must be good here)
    shift_tgt_train   target training images — used UNLABELED by DA runs
                      (annotations exist in the json for oracle experiments;
                      the unlabeled loader strips them)
    shift_tgt_val     target validation — THE efficacy metric (AP50 here)
"""

import json
import os

import numpy as np
from PIL import Image, ImageFilter

CLASSES = ["rect", "ring", "cross"]

# target-domain shift parameters (the "fog model"); module-level so the
# efficacy report can record them.
#
# Calibration rationale (round-4 pilots, STATUS.md): the shift must sit in
# the regime where DAOD lives. Two failure modes bracket it:
#   - too mild (fog_contrast ~0.4+, blur <=1.5, low noise): source-only
#     training closes the gap itself, because the strong-aug recipe
#     (data/strong_aug.py: color jitter, grayscale, gaussian blur sigma
#     <=2.0, random erase) SPANS fog contrast and blur — augmentation
#     robustness substitutes for adaptation.
#   - too strong (fog_contrast ~0.2-0.32, blur 1.2-2.2): the burn-in
#     teacher is blind on target (AP75 ~3, p99 score 0.41), pseudo-labels
#     vanish at any threshold, and the self-training flywheel never turns.
# The calibrated shift therefore carries the domain gap primarily in fog
# contrast OUTSIDE the jitter span (strong-aug contrast blends with weight
# >= 0.6 toward the mean; fog c ~ 0.30-0.42 toward the haze is beyond it —
# measured: c in (0.45, 0.60) lets the burn-in model reach ~85 target AP50
# and keep climbing, c in (0.20, 0.32) blinds the teacher to ~31 with p99
# score 0.41), composed with in-span blur and mild sensor noise. This
# mirrors the role of real fog's depth-dependent rendering in
# Cityscapes->Foggy: a target appearance no source-side aug reproduces.
SHIFT = {
    "fog_contrast": (0.30, 0.42),   # arr*c + haze*(1-c), c ~ U(range)
    "fog_haze": 190.0,              # haze gray level
    "color_cast": (1.10, 0.85, 0.70),  # per-channel gain (warm cast)
    "blur_radius": (1.0, 1.8),      # Gaussian blur radius ~ U(range)
    "noise_std": 12.0,              # additive Gaussian sensor noise
}


def _draw_objects(rng, h, w, max_objects=3):
    """One image (f32 HWC, 0..255) + its boxes/classes, shape-coded."""
    img = rng.uniform(0, 40, (h, w, 3)).astype(np.float32)
    n = int(rng.integers(1, max_objects + 1))
    boxes, classes = [], []
    for _ in range(n):
        bw = int(rng.integers(26, 56))
        bh = int(rng.integers(26, 56))
        x0 = int(rng.integers(0, w - bw))
        y0 = int(rng.integers(0, h - bh))
        c = int(rng.integers(0, 3))
        col = rng.uniform(150, 255, 3)
        if c == 0:  # filled rect
            img[y0:y0 + bh, x0:x0 + bw] = col
        elif c == 1:  # ring
            img[y0:y0 + bh, x0:x0 + bw] = col
            t = max(4, min(bw, bh) // 6)
            img[y0 + t:y0 + bh - t, x0 + t:x0 + bw - t] = 20.0
        else:  # cross
            cy, cx = y0 + bh // 2, x0 + bw // 2
            a = max(3, min(bw, bh) // 8)
            img[cy - a:cy + a, x0:x0 + bw] = col
            img[y0:y0 + bh, cx - a:cx + a] = col
        boxes.append([x0, y0, bw, bh])
        classes.append(c)
    return img, boxes, classes


def _apply_shift(img, rng):
    """Fog + blur + color cast + noise: the target-domain rendering."""
    arr = img * np.asarray(SHIFT["color_cast"], np.float32)
    c = float(rng.uniform(*SHIFT["fog_contrast"]))
    arr = arr * c + SHIFT["fog_haze"] * (1.0 - c)
    pil = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))
    pil = pil.filter(ImageFilter.GaussianBlur(
        float(rng.uniform(*SHIFT["blur_radius"]))))
    arr = np.asarray(pil, np.float32)
    arr = arr + rng.normal(0.0, SHIFT["noise_std"], arr.shape)
    return np.clip(arr, 0, 255)


def make_shift_split(root, name, n_images, seed, shifted,
                     size=(128, 128)):
    """Write images + COCO json under root/name; returns (json, img_dir)."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, name, "images")
    os.makedirs(img_dir, exist_ok=True)
    h, w = size
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img, boxes, classes = _draw_objects(rng, h, w)
        if shifted:
            img = _apply_shift(img, rng)
        fname = f"img_{i:04d}.png"
        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(img_dir, fname))
        images.append(
            {"id": i + 1, "file_name": fname, "height": h, "width": w})
        for (x0, y0, bw, bh), c in zip(boxes, classes):
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": c + 1,
                "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": c + 1, "name": n} for c, n in enumerate(CLASSES)
        ],
    }
    json_path = os.path.join(root, name, "annotations.json")
    with open(json_path, "w") as f:
        json.dump(coco, f)
    return json_path, img_dir


# split -> (n_images, generator seed, shifted). Seeds differ per split so no
# source image has a shifted twin in the target set (disjoint scenes, like
# disjoint Cityscapes cities) — except tgt_train/src_train being disjoint
# matters less than tgt_val being disjoint from everything.
SPLITS = {
    "shift_src_train": (160, 10, False),
    "shift_src_val": (64, 11, False),
    # more unlabeled target data (the DA runs' raw material) and a larger
    # target val split: at 128 images the AP50 eval noise was ~+-5 between
    # adjacent evals, swamping few-point DA effects; 320 images (~640
    # objects) brings it down to ~+-1-2
    "shift_tgt_train": (256, 12, True),
    "shift_tgt_val": (320, 13, True),
}


def register_shift_benchmark(root):
    """Generate (if absent) + register the 4 splits. Returns split names."""
    from aldi_tpu.data.catalog import DatasetCatalog, register_coco_instances

    out = []
    for name, (n, seed, shifted) in SPLITS.items():
        if name not in DatasetCatalog:
            jp = os.path.join(root, name, "annotations.json")
            ir = os.path.join(root, name, "images")
            if not os.path.exists(jp):
                jp, ir = make_shift_split(root, name, n, seed, shifted)
            register_coco_instances(name, {}, jp, ir)
        out.append(name)
    return out
