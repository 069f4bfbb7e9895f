#!/usr/bin/env python3
"""Export a trained detector's inference path to a serving artifact.

The reference has no export tool — deploying it means shipping torch +
Detectron2 + the checkpoint and running the eval loop
(``/root/reference/tools/train_net.py`` ``--eval-only``). Here the serving
path is frozen to one self-contained StableHLO artifact (weights baked in,
cpu+tpu lowered) loadable with jax alone — see
``aldi_tpu/engine/export.py`` for the artifact contract.

Usage:
    python tools/export_model.py --config-file configs/cityscapes/ALDI-Best-Cityscapes.yaml \
        --weights out/model_best.ckpt --output out/serving --batch 4
    # smoke the artifact after writing it:
    python tools/export_model.py ... --selftest
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="aldi_tpu serving export")
    p.add_argument("--config-file", required=True)
    p.add_argument("--weights", default=None,
                   help="checkpoint to export (default: cfg.MODEL.WEIGHTS; "
                        "'' exports fresh-init weights)")
    p.add_argument("--output", default=None,
                   help="artifact directory (default: OUTPUT_DIR/serving)")
    p.add_argument("--batch", type=int, default=1,
                   help="serving batch size baked into the artifact")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma list of lowering targets")
    p.add_argument("--ema", action="store_true",
                   help="export the EMA-teacher weights; without this flag "
                        "the student weights are exported (fresh loads are "
                        "done with load_from_ema=--ema so the student is "
                        "actually reachable in EMA-bearing checkpoints)")
    p.add_argument("--selftest", action="store_true",
                   help="reload the artifact and run one batch through it")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="config overrides KEY VALUE ...")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from aldi_tpu.config import get_cfg
    from aldi_tpu.engine.checkpoint import Checkpointer
    from aldi_tpu.engine.export import (export_inference, load_artifact,
                                        save_artifact)
    from aldi_tpu.engine.train_step import create_train_state
    from aldi_tpu.models import build_detector

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    det = build_detector(cfg)
    state, _ = create_train_state(cfg, det, jax.random.PRNGKey(0))
    weights = cfg.MODEL.WEIGHTS if args.weights is None else args.weights
    if weights:
        ckptr = Checkpointer(cfg.OUTPUT_DIR)
        # load_from_ema follows --ema: the default (student) export must not
        # silently receive EMA-preferred weights from a fresh load
        state = ckptr.resume_or_load(state, weights, resume=False,
                                     load_from_ema=args.ema)
        print(f"loaded weights from {weights}"
              + (" (EMA preferred)" if args.ema else " (student)"))
    else:
        print("exporting fresh-initialized weights (no --weights given)")

    params = state.params
    model_state = state.model_state
    if args.ema:
        if state.ema_params is None:
            raise SystemExit("--ema: checkpoint has no EMA params "
                             "(EMA.ENABLED was off)")
        params = state.ema_params
        model_state = state.ema_model_state
    variables = {"params": params, "frozen": state.frozen,
                 **(model_state or {})}

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    blobs = export_inference(det, variables, args.batch, platforms=platforms)
    out_dir = args.output or os.path.join(cfg.OUTPUT_DIR, "serving")
    save_artifact(out_dir, blobs, det, cfg, args.batch)
    sizes_mb = ", ".join(
        f"{p}: {len(b) / 1e6:.1f} MB" for p, b in blobs.items())
    print(f"wrote {out_dir} ({sizes_mb}; batch={args.batch}, "
          f"canvas={det.canvas})")

    if args.selftest:
        import numpy as np

        model = load_artifact(out_dir)
        h, w = model.meta["canvas"]
        images = np.random.default_rng(0).uniform(
            0, 255, (args.batch, h, w, 3)).astype(np.float32)
        sizes = np.tile([[h, w]], (args.batch, 1)).astype(np.int32)
        out = model(images, sizes)
        n = int(np.asarray(out["valid"]).sum())
        print(f"selftest OK: {n} detections across {args.batch} images")


if __name__ == "__main__":
    main()
