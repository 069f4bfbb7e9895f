#!/usr/bin/env python3
"""PCA scatter plots of backbone / box features across two domains
(reference ``tools/visualize_featurespace.py``: forward-hook feature taps +
PCA). Feature taps are trivial here — the detector returns intermediates
explicitly — and PCA is a numpy SVD.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pca_2d(x: np.ndarray) -> np.ndarray:
    x = x - x.mean(0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:2].T


def collect_features(cfg, detector, variables, dataset, n_images, level):
    import jax

    from aldi_tpu.data.loader import TestLoader

    feats = []
    loader = TestLoader(dataset, cfg, detector.canvas, batch_size=2)
    fwd = jax.jit(
        lambda v, im: detector.backbone(v, detector.preprocess(im))
    )
    for batch, metas in loader:
        out = fwd(variables, batch["image"])[level]
        # global-average-pool each image's feature map
        pooled = np.asarray(out.mean(axis=(1, 2)))
        feats.extend(pooled[: len(metas)])
        if len(feats) >= n_images:
            break
    return np.stack(feats[:n_images])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", "--config", required=True)
    p.add_argument("--weights", default="")
    p.add_argument("--datasets", nargs=2, required=True,
                   help="source and target dataset names")
    p.add_argument("--num-images", type=int, default=50)
    p.add_argument("--level", type=int, default=0, help="FPN level index")
    p.add_argument("--out", default="featurespace.png")
    p.add_argument("opts", nargs="*")
    args = p.parse_args()

    import jax

    from aldi_tpu.config import get_cfg
    from aldi_tpu.engine.checkpoint import load_reference_weights
    from aldi_tpu.engine.train_step import create_train_state
    from aldi_tpu.models import build_detector
    import aldi_tpu.data.datasets  # noqa: F401

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    detector = build_detector(cfg)
    state, _ = create_train_state(cfg, detector, jax.random.PRNGKey(0))
    weights = args.weights or cfg.MODEL.WEIGHTS
    if weights:
        state = load_reference_weights(state, weights)
    variables = {"params": state.params, "frozen": state.frozen,
                 **(state.model_state or {})}

    fa = collect_features(
        cfg, detector, variables, args.datasets[0], args.num_images,
        args.level,
    )
    fb = collect_features(
        cfg, detector, variables, args.datasets[1], args.num_images,
        args.level,
    )
    xy = pca_2d(np.concatenate([fa, fb]))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(6, 6))
        plt.scatter(xy[: len(fa), 0], xy[: len(fa), 1], label=args.datasets[0],
                    alpha=0.6)
        plt.scatter(xy[len(fa):, 0], xy[len(fa):, 1], label=args.datasets[1],
                    alpha=0.6)
        plt.legend()
        plt.title(f"backbone feature space (level {args.level})")
        plt.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
    except ImportError:
        np.save(args.out + ".npy", xy)
        print(f"matplotlib unavailable; wrote raw PCA coords to {args.out}.npy")


if __name__ == "__main__":
    main()
