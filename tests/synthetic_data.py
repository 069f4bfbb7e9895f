"""Synthetic COCO dataset fixture: tiny images with colored rectangles.

The reference's only test downloads real checkpoints and runs 1 iter on real
data (``tests/test_all_configs_cityscapes.sh``); this fixture enables the
same smoke test CPU-only with no downloads (SURVEY.md section 4 item c).
"""

import json
import os

import numpy as np
from PIL import Image, ImageDraw

CLASSES = ["square", "circle", "triangle"]


def make_synthetic_coco(root: str, name: str, n_images: int = 8,
                        size=(96, 128), seed: int = 0, fog: bool = False):
    """Create images + COCO json under root/name. Returns (json_path,
    image_dir)."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, name, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    h, w = size
    for i in range(n_images):
        img = Image.new(
            "RGB", (w, h),
            tuple(int(x) for x in rng.integers(0, 80, 3)),
        )
        draw = ImageDraw.Draw(img)
        for _ in range(int(rng.integers(1, 4))):
            bw = int(rng.integers(12, w // 2))
            bh = int(rng.integers(12, h // 2))
            x0 = int(rng.integers(0, w - bw))
            y0 = int(rng.integers(0, h - bh))
            cat = int(rng.integers(0, len(CLASSES)))
            color = [(255, 60, 60), (60, 255, 60), (60, 60, 255)][cat]
            if cat == 0:
                draw.rectangle([x0, y0, x0 + bw, y0 + bh], fill=color)
            elif cat == 1:
                draw.ellipse([x0, y0, x0 + bw, y0 + bh], fill=color)
            else:
                draw.polygon(
                    [(x0 + bw // 2, y0), (x0, y0 + bh), (x0 + bw, y0 + bh)],
                    fill=color,
                )
            annotations.append({
                "id": ann_id, "image_id": i + 1,
                "category_id": cat + 1,
                "bbox": [x0, y0, bw, bh],
                "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
        if fog:
            arr = np.asarray(img, np.float32)
            arr = arr * 0.5 + 128 * 0.5
            img = Image.fromarray(arr.astype(np.uint8))
        fname = f"img_{i:04d}.png"
        img.save(os.path.join(img_dir, fname))
        images.append({
            "id": i + 1, "file_name": fname, "height": h, "width": w,
        })
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


def register_synthetic(root: str, prefix: str = "synth"):
    """Register synth_train / synth_val / synth_unlabeled datasets."""
    from aldi_tpu.data.catalog import DatasetCatalog, register_coco_instances

    out = {}
    for split, (n, seed, fog) in {
        "train": (8, 0, False),
        "val": (4, 1, False),
        "unlabeled": (8, 2, True),
    }.items():
        name = f"{prefix}_{split}"
        if name in DatasetCatalog:
            out[name] = name
            continue
        jp, ir = make_synthetic_coco(root, name, n, seed=seed, fog=fog)
        register_coco_instances(name, {}, jp, ir)
        out[name] = name
    return out
