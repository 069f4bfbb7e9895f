#!/usr/bin/env python3
"""Convert Cityscapes gtFine polygon annotations to COCO-format jsons for
the DAOD benchmarks (reference ``tools/convert_cityscapes_to_coco.py``):

- the 8 DAOD classes (person rider car truck bus train motorcycle bicycle)
- optional --cars-only variant (Sim10k -> Cityscapes protocol)
- optional --foggy mode: each annotation is replicated for the three foggy
  beta renderings (0.005 / 0.01 / 0.02) of every image, tripling the image
  list (reference ``tools/convert_cityscapes_to_coco.py:48-105``)
"""

import argparse
import glob
import json
import os

CLASSES = [
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
]
FOGGY_BETAS = ["0.005", "0.01", "0.02"]


def poly_bbox(polygon):
    xs = [p[0] for p in polygon]
    ys = [p[1] for p in polygon]
    x0, y0, x1, y1 = min(xs), min(ys), max(xs), max(ys)
    return [x0, y0, x1 - x0, y1 - y0]


def convert(gt_dir, split, cars_only=False, foggy=False):
    classes = ["car"] if cars_only else CLASSES
    cat_ids = {c: i + 1 for i, c in enumerate(classes)}
    images, annotations = [], []
    img_id, ann_id = 0, 0
    files = sorted(
        glob.glob(
            os.path.join(gt_dir, split, "*", "*_gtFine_polygons.json")
        )
    )
    for f in files:
        with open(f) as fp:
            gt = json.load(fp)
        city = os.path.basename(os.path.dirname(f))
        stem = os.path.basename(f).replace("_gtFine_polygons.json", "")
        suffixes = (
            [f"_leftImg8bit_foggy_beta_{b}.png" for b in FOGGY_BETAS]
            if foggy else ["_leftImg8bit.png"]
        )
        for sfx in suffixes:
            img_id += 1
            images.append(
                {
                    "id": img_id,
                    "file_name": f"{city}/{stem}{sfx}",
                    "height": gt["imgHeight"],
                    "width": gt["imgWidth"],
                }
            )
            for obj in gt["objects"]:
                label = obj["label"]
                if label.endswith("group"):
                    continue
                if label not in cat_ids:
                    continue
                bbox = poly_bbox(obj["polygon"])
                if bbox[2] <= 1 or bbox[3] <= 1:
                    continue
                ann_id += 1
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": img_id,
                        "category_id": cat_ids[label],
                        "bbox": bbox,
                        "area": bbox[2] * bbox[3],
                        "iscrowd": 0,
                    }
                )
    return {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": i, "name": c} for c, i in cat_ids.items()
        ],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt-dir", required=True,
                   help="path to cityscapes gtFine/")
    p.add_argument("--split", default="train", choices=["train", "val"])
    p.add_argument("--out", required=True)
    p.add_argument("--cars-only", action="store_true")
    p.add_argument("--foggy", action="store_true")
    args = p.parse_args()
    coco = convert(args.gt_dir, args.split, args.cars_only, args.foggy)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(coco, f)
    print(
        f"wrote {args.out}: {len(coco['images'])} images, "
        f"{len(coco['annotations'])} annotations"
    )


if __name__ == "__main__":
    main()
