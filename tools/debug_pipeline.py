#!/usr/bin/env python3
"""One-iteration visual debug of the weak/strong/pseudo-label pipeline
(reference ``tools/debug_ddp.py``: run 1 iter with debug capture, plot
weak/strong/pseudo-labeled images with boxes — bit-rotted in the reference
snapshot; this version drives the functional pipeline directly).

Writes PNGs into --out: {weak,strong}_{i}.png with GT boxes, and for DAOD
configs pseudo_{i}.png with the teacher's thresholded pseudo-labels.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def draw(img_bgr_or_rgb, boxes, valid, path, color=(255, 60, 60), bgr=True):
    from PIL import Image, ImageDraw

    arr = np.asarray(img_bgr_or_rgb, np.uint8)
    if bgr:
        arr = arr[:, :, ::-1]
    img = Image.fromarray(arr)
    d = ImageDraw.Draw(img)
    for b, v in zip(np.asarray(boxes), np.asarray(valid)):
        if v:
            d.rectangle([float(b[0]), float(b[1]), float(b[2]), float(b[3])],
                        outline=color, width=2)
    img.save(path)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", "--config", required=True)
    p.add_argument("--out", default="debug_out")
    p.add_argument("opts", nargs="*")
    args = p.parse_args()

    import jax

    from aldi_tpu.config import get_cfg
    from aldi_tpu.data.loader import WeakStrongLoader
    from aldi_tpu.data.strong_aug import strong_augment
    from aldi_tpu.engine.checkpoint import load_reference_weights
    from aldi_tpu.engine.train_step import create_train_state
    from aldi_tpu.models import build_detector
    import aldi_tpu.data.datasets  # noqa: F401

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    os.makedirs(args.out, exist_ok=True)
    bgr = cfg.INPUT.FORMAT.upper() == "BGR"

    detector = build_detector(cfg)
    loader = WeakStrongLoader(cfg, detector.canvas, seed=0)
    batch = next(loader)

    lab = batch["labeled"]
    strong = strong_augment(
        jax.random.PRNGKey(0), lab["image"], lab["sizes"],
        include_erasing=cfg.AUG.LABELED_INCLUDE_RANDOM_ERASING,
        mic=cfg.AUG.LABELED_MIC_AUG,
        mic_ratio=cfg.AUG.MIC_RATIO, mic_block_size=cfg.AUG.MIC_BLOCK_SIZE,
    )
    for i in range(min(4, lab["image"].shape[0])):
        draw(lab["image"][i], lab["boxes"][i], lab["valid"][i],
             os.path.join(args.out, f"weak_{i}.png"), bgr=bgr)
        draw(np.clip(np.asarray(strong[i]), 0, 255).astype(np.uint8),
             lab["boxes"][i], lab["valid"][i],
             os.path.join(args.out, f"strong_{i}.png"), bgr=bgr)

    if batch["unlabeled"]["image"].shape[0]:
        state, _ = create_train_state(cfg, detector, jax.random.PRNGKey(0))
        if cfg.MODEL.WEIGHTS:
            state = load_reference_weights(state, cfg.MODEL.WEIGHTS)
        variables = {"params": state.params, "frozen": state.frozen,
                     **(state.model_state or {})}
        u = batch["unlabeled"]
        ctx, pseudo, metrics = jax.jit(
            lambda v, im, sz, r: detector.forward_teacher_ctx(
                v, im, sz, r,
                threshold=cfg.DOMAIN_ADAPT.TEACHER.THRESHOLD,
                max_gt=cfg.TPU.MAX_GT,
            )
        )(variables, u["image"], u["sizes"], jax.random.PRNGKey(1))
        for i in range(min(4, u["image"].shape[0])):
            draw(u["image"][i], pseudo.boxes[i], pseudo.valid[i],
                 os.path.join(args.out, f"pseudo_{i}.png"),
                 color=(60, 255, 60), bgr=bgr)
        print(f"avg pseudo labels/image: "
              f"{float(metrics['num_pseudo_labels']):.2f}")
    print(f"wrote debug images to {args.out}/")


if __name__ == "__main__":
    main()
