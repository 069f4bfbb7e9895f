"""Calibrate DOMAIN_ADAPT.TEACHER.THRESHOLD against a burn-in teacher.

The reference ships THRESHOLD=0.8 (``/root/reference/aldi/config.py``
defaults), which presumes a COCO-pretrained teacher whose confident
detections survive the domain shift. On the offline synthetic shift
benchmark the burn-in teacher is trained from scratch, and round-4 pilots
showed the 0.8 threshold passes ZERO pseudo-labels on the shifted target
(``STATUS.md`` round-4 efficacy analysis) — making every hard pseudo-label
loss vacuous. This tool measures the teacher's actual score distribution on
the target split so the experiment picks a threshold where the self-training
flywheel can turn.

Usage (datasets must be registered first, as in tools/efficacy_experiment.py):

    python - <<'PY'
    from tests.shift_benchmark import register_shift_benchmark
    register_shift_benchmark("/tmp/aldi_shift/data")
    import tools.calibrate_threshold as ct
    ct.main(["--config-file", "<burn-in config.yaml>",
             "MODEL.WEIGHTS", "<burn-in ckpt>"])
    PY

Prints detection-score percentiles and pseudo-labels/image at candidate
thresholds, next to the true GT density, and recommends the DENSITY-MATCHED
threshold: the exact score quantile at which pseudo-label density equals the
GT object density (precision/recall balance point for self-training; a
denser choice admits noise, a sparser one starves the distill losses).
"""

import argparse
import json
import sys

import jax
import numpy as np


def collect_scores(trainer, dataset_name, batch_size=8):
    """Teacher (EMA) inference over a dataset; returns per-image score rows."""
    from aldi_tpu.data.loader import TestLoader

    variables = trainer._eval_variables()
    detector = trainer.detector
    fwd = getattr(detector, "_jit_infer", None)
    if fwd is None:
        fwd = jax.jit(detector.forward_inference)
        detector._jit_infer = fwd
    loader = TestLoader(dataset_name, trainer.cfg, detector.canvas,
                        batch_size)
    per_image = []
    for batch, metas in loader:
        _, scores, _, valid = jax.device_get(
            fwd(variables, batch["image"], batch["sizes"])
        )
        for i in range(len(metas)):
            per_image.append(scores[i][valid[i].astype(bool)])
    return per_image


def gt_density(dataset_name):
    from aldi_tpu.data.catalog import DatasetCatalog

    records = DatasetCatalog.get(dataset_name)
    n = sum(len(r["annotations"]) for r in records)
    return n / max(len(records), 1)


def recommend_threshold(rows, gt_per_image, floor=0.05):
    """Density-matched threshold: the score quantile at which pseudo-label
    density equals ``gt_per_image`` (AdaMatch-style distribution matching).
    Returns None when the teacher emits too few detections above ``floor``
    to reach GT density at any threshold — no usable operating point."""
    flat = (np.concatenate(rows) if rows and any(len(r) for r in rows)
            else np.zeros((0,), np.float32))
    target = gt_per_image * max(len(rows), 1)
    usable = np.sort(flat[flat > floor])[::-1]
    if usable.size >= target and target >= 1:
        return float(usable[int(round(target)) - 1])
    return None


def calibrate(trainer, dataset_name, thresholds):
    rows = collect_scores(trainer, dataset_name)
    flat = (np.concatenate(rows) if rows and any(len(r) for r in rows)
            else np.zeros((0,), np.float32))
    out = {
        "dataset": dataset_name,
        "images": len(rows),
        "detections": int(flat.size),
        "gt_per_image": round(gt_density(dataset_name), 2),
        "score_percentiles": {
            f"p{p}": round(float(np.percentile(flat, p)), 4)
            for p in (10, 25, 50, 75, 90, 99)
        } if flat.size else {},
        "pseudo_per_image": {
            f"{t:.2f}": round(float(np.mean([(r > t).sum() for r in rows])), 2)
            for t in thresholds
        },
    }
    # a grid of candidate thresholds is too coarse — measured on the shift
    # benchmark, density falls 3.55 -> 0.43 between candidates 0.30/0.40
    # while GT density is 2.04. Below the matched point the distill stream
    # samples proposals against near-empty pseudo-GT (starved); above it
    # the teacher's noise becomes supervision (flooded).
    thr = recommend_threshold(rows, out["gt_per_image"])
    if thr is not None:
        out["recommended_threshold"] = round(thr, 4)
        out["density_at_recommended"] = round(
            float(np.mean([(r > thr).sum() for r in rows])), 2)
    else:
        out["recommended_threshold"] = None
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument("--dataset", default=None,
                   help="defaults to DATASETS.UNLABELED[0]")
    p.add_argument("--thresholds",
                   default="0.3,0.4,0.5,0.6,0.7,0.8,0.9")
    p.add_argument("--out", default=None, help="optional JSON output path")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args(argv)

    from aldi_tpu.config import get_cfg
    from aldi_tpu.engine.trainer import ALDITrainer

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    trainer = ALDITrainer(cfg)
    trainer.resume_or_load(resume=False)

    dataset = args.dataset or (cfg.DATASETS.UNLABELED or cfg.DATASETS.TEST)[0]
    thresholds = [float(t) for t in args.thresholds.split(",")]
    report = calibrate(trainer, dataset, thresholds)
    print(json.dumps(report, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return report


if __name__ == "__main__":
    main(sys.argv[1:])
