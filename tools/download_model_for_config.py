#!/usr/bin/env python3
"""Fetch the MODEL.WEIGHTS file a config expects (reference
``tools/download_model_for_config.py``: pulls named checkpoints from the
ALDI GitHub release and D2 zoo URLs into ./models/)."""

import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ALDI_RELEASE = (
    "https://github.com/justinkay/aldi/releases/download/v0.0.1/"
)
D2_ZOO = {
    # COCO-pretrained Faster R-CNN R50-FPN 3x (Base-RCNN-FPN.yaml)
    "model_final_f10217.pkl":
        "https://dl.fbaipublicfiles.com/detectron2/COCO-InstanceSegmentation/"
        "mask_rcnn_R_50_FPN_3x/137849600/model_final_f10217.pkl",
    # ViTDet-B / ViTDet-L COCO
    "model_final_61ccd1.pkl":
        "https://dl.fbaipublicfiles.com/detectron2/ViTDet/COCO/"
        "mask_rcnn_vitdet_b/f325346929/model_final_61ccd1.pkl",
    "model_final_6146ed.pkl":
        "https://dl.fbaipublicfiles.com/detectron2/ViTDet/COCO/"
        "mask_rcnn_vitdet_l/f325599698/model_final_6146ed.pkl",
}


def url_for(weights_path: str) -> str:
    name = os.path.basename(weights_path)
    if name in D2_ZOO:
        return D2_ZOO[name]
    return ALDI_RELEASE + name


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", "--config", required=True)
    p.add_argument("--output-dir", default="models")
    args = p.parse_args()

    from aldi_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    weights = cfg.MODEL.WEIGHTS
    if not weights:
        print("config has no MODEL.WEIGHTS; nothing to download")
        return
    os.makedirs(args.output_dir, exist_ok=True)
    dest = os.path.join(args.output_dir, os.path.basename(weights))
    if os.path.exists(dest):
        print(f"already present: {dest}")
        return
    url = url_for(weights)
    print(f"downloading {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)
    print("done")


if __name__ == "__main__":
    main()
