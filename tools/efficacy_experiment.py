#!/usr/bin/env python3
"""End-to-end DAOD efficacy experiment on the synthetic domain-shift
benchmark, run through the real CLI (``tools/train_net.py``).

The reference's core claim is that ALDI++ improves target-domain AP over
source-only training (``/root/reference/README.md:89-93``), via the
burn-in -> DA protocol (``/root/reference/docs/TRAINING.md:11-25``).
Real-data AP parity is impossible offline; this experiment is the strongest
offline substitute: a controlled synthetic source->target shift
(tests/shift_benchmark.py, fog+blur+color-cast — the synthetic analog of
Cityscapes->Foggy) run through the exact reference protocol:

per seed:
  arm A  source-only: train Base-RCNN-FPN-Shift.yaml for 800 iters on
         labeled source (strong aug + EMA). Its 400-iter checkpoint doubles
         as the DA burn-in init; its 800-iter endpoint is the
         equal-compute source-only control.
  arm B  ALDI++: ALDI-Shift.yaml from the 400-iter burn-in checkpoint
         (EMA handoff, reference aldi/checkpoint.py:18-32), 400 DA iters
         on source + unlabeled target.
  arm C  no-distill ablation: arm B with every distillation loss disabled
         (the unlabeled stream then contributes nothing — continued source
         training at DA hyperparameters).

All numbers are teacher-EMA AP50 on shift_tgt_val (the target domain), with
shift_src_val tracked as a sanity column. Results -> EFFICACY.json, asserted
by tests/test_efficacy.py: DA beats source-only by a clear margin on every
seed, and ablating distillation shrinks the gain.
"""

import argparse
import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_CFG = os.path.join(REPO, "configs", "synthetic",
                        "Base-RCNN-FPN-Shift.yaml")
ALDI_CFG = os.path.join(REPO, "configs", "synthetic", "ALDI-Shift.yaml")

NO_DISTILL_OPTS = [
    "DOMAIN_ADAPT.DISTILL.ROIH_CLS_ENABLED", "False",
    "DOMAIN_ADAPT.DISTILL.ROIH_REG_ENABLED", "False",
    "DOMAIN_ADAPT.DISTILL.OBJ_ENABLED", "False",
    "DOMAIN_ADAPT.DISTILL.RPN_REG_ENABLED", "False",
]


def _train_net():
    spec = importlib.util.spec_from_file_location(
        "train_net", os.path.join(REPO, "tools", "train_net.py"))
    tn = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tn)
    return tn


def run_cli(tn, config_file, opts, eval_only=False, resume=False):
    """One tools/train_net.py invocation (the real CLI path, in-process)."""
    argv = ["--config-file", config_file]
    if eval_only:
        argv.append("--eval-only")
    if resume:
        argv.append("--resume")
    argv += [str(o) for o in opts]
    args = tn.default_argument_parser().parse_args(argv)
    return tn.main(args)


def run_leg(data_root, config_file, opts, eval_only=False, resume=False):
    """One CLI invocation in a SUBPROCESS.

    Every leg used to run in this process; host memory (trainer state,
    jitted programs, PJRT buffers) accumulates ~30-40 GB per seed and never
    returns, and the 4-seed run was OOM-killed by the kernel mid seed 1
    (anon-rss 118 GB). Per-leg subprocesses bound peak RSS to one leg; the
    persistent compile cache keeps re-warm costs to seconds."""
    spec = {"kind": "cli", "config": config_file,
            "opts": [str(o) for o in opts],
            "eval_only": eval_only, "resume": resume}
    return _spawn_leg(data_root, spec)


def _spawn_leg(data_root, spec):
    fd, out_path = tempfile.mkstemp(prefix="aldi_leg_", suffix=".json")
    os.close(fd)
    try:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--leg", json.dumps(spec), "--leg-out", out_path,
             "--data-root", data_root],
            check=True,
        )
        with open(out_path) as f:
            return json.load(f)
    finally:
        os.unlink(out_path)


def _leg_main(args):
    """Child-process entry: register the benchmark, run one leg, dump JSON."""
    if os.environ.get("ALDI_EFFICACY_PLATFORM"):
        # platform pin for CPU smoke tests of the driver plumbing. The env
        # var alone is NOT enough on machines whose site hook preloads jax
        # and forces its own platform list (see tests/conftest.py).
        import jax

        jax.config.update("jax_platforms",
                          os.environ["ALDI_EFFICACY_PLATFORM"])
    from tests.shift_benchmark import register_shift_benchmark

    register_shift_benchmark(args.data_root)
    spec = json.loads(args.leg)
    if spec["kind"] == "cli":
        tn = _train_net()
        results = run_cli(tn, spec["config"], spec["opts"],
                          eval_only=spec["eval_only"], resume=spec["resume"])
        out = {
            "results": {
                ds: {k: float(v) for k, v in r.items()}
                for ds, r in (results or {}).items()
            },
        }
    elif spec["kind"] == "calib":
        thr, report = calibrate_threshold(
            spec["burnin_ckpt"], spec["seed"], spec["out_root"])
        out = {"threshold": thr, "report": report}
    else:
        raise ValueError(f"unknown leg kind {spec['kind']}")
    import jax

    out["backend"] = jax.default_backend()
    with open(args.leg_out, "w") as f:
        json.dump(out, f)


def _ap50s(results):
    return {ds: round(float(r["bbox/AP50"]), 2) for ds, r in results.items()}


def calibrate_threshold(burnin_ckpt, seed, out_root):
    """Pick DOMAIN_ADAPT.TEACHER.THRESHOLD from the burn-in teacher's score
    distribution on the target split (tools/calibrate_threshold.py).

    The reference's 0.8 default presumes a COCO-pretrained teacher; on the
    from-scratch synthetic benchmark it passes zero pseudo-labels (STATUS.md
    round-4 analysis), making the hard pseudo-label stream vacuous.
    """
    from aldi_tpu.config import get_cfg
    from aldi_tpu.engine.trainer import ALDITrainer
    from tools.calibrate_threshold import calibrate

    cfg = get_cfg()
    cfg.merge_from_file(BASE_CFG)
    cfg.merge_from_list(["SEED", seed, "MODEL.WEIGHTS", burnin_ckpt,
                         "OUTPUT_DIR",
                         os.path.join(out_root, f"calib_s{seed}")])
    cfg.freeze()
    trainer = ALDITrainer(cfg)
    trainer.resume_or_load(resume=False)
    report = calibrate(trainer, "shift_tgt_train",
                       [0.3, 0.4, 0.5, 0.6, 0.7, 0.8])
    print(f"seed {seed} threshold calibration: {json.dumps(report)}",
          flush=True)
    thr = report["recommended_threshold"]
    if thr is None:
        raise RuntimeError(
            f"vacuous DA setup: burn-in teacher produces no usable "
            f"pseudo-labels at any candidate threshold ({report})"
        )
    return thr, report


def check_not_vacuous(da_out):
    """Fail loudly if a DA arm ran with zero pseudo-labels throughout —
    such a run cannot evidence (or refute) the DAOD machinery."""
    path = os.path.join(da_out, "metrics.json")
    counts = []
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            if "num_pseudo_labels" in row:
                counts.append(float(row["num_pseudo_labels"]))
    if not counts or max(counts) <= 0:
        raise RuntimeError(
            f"vacuous DA run in {da_out}: num_pseudo_labels never exceeded "
            f"0 over {len(counts)} logged iterations — calibrate "
            f"DOMAIN_ADAPT.TEACHER.THRESHOLD (tools/calibrate_threshold.py)"
        )
    return sum(counts) / len(counts)


def run_seed(data_root, seed, out_root, burnin=1200, da_iters=400,
             threshold=None):
    t0 = time.time()
    res = {}
    base_out = os.path.join(out_root, f"base_s{seed}")
    aldi_out = os.path.join(out_root, f"aldi_s{seed}")
    nodistill_out = os.path.join(out_root, f"nodistill_s{seed}")
    burnin_ckpt = os.path.join(base_out, f"model_{burnin:07d}")
    common = ["SEED", seed]

    def leg(config, opts, **kw):
        return run_leg(data_root, config, opts, **kw)

    # arm A: source-only burnin+da_iters total (burnin ckpt = DA init).
    # burn-in length is calibrated to SOURCE saturation (the reference
    # burns in to convergence before DA, docs/TRAINING.md:11-25), so the
    # +da_iters source-only continuation is a true equal-compute control
    leg(BASE_CFG, common + [
        "OUTPUT_DIR", base_out,
        "SOLVER.MAX_ITER", burnin + da_iters,
        "SOLVER.STEPS", f"({burnin + da_iters - 100},)",
        "SOLVER.CHECKPOINT_PERIOD", burnin,
    ])
    res["source_only"] = _ap50s(leg(
        BASE_CFG, common + ["OUTPUT_DIR", base_out],
        eval_only=True, resume=True)["results"])

    # burn-in checkpoint evaluated on its own: the DA starting point
    res["burnin"] = _ap50s(leg(
        BASE_CFG,
        common + ["OUTPUT_DIR", os.path.join(out_root, f"evalburn_s{seed}"),
                  "MODEL.WEIGHTS", burnin_ckpt],
        eval_only=True)["results"])

    # teacher-confidence threshold: calibrated against this seed's burn-in
    # teacher unless pinned on the command line
    if threshold is None:
        calib_leg = _spawn_leg(data_root, {
            "kind": "calib", "burnin_ckpt": burnin_ckpt, "seed": seed,
            "out_root": out_root,
        })
        threshold, calib = calib_leg["threshold"], calib_leg["report"]
        res["threshold_calibration"] = calib
    res["threshold"] = threshold

    da_opts = ["SOLVER.MAX_ITER", da_iters, "SOLVER.STEPS",
               f"({da_iters - 1},)", "SOLVER.CHECKPOINT_PERIOD", da_iters,
               "DOMAIN_ADAPT.TEACHER.THRESHOLD", threshold]

    # arm B: ALDI++ DA from the burn-in checkpoint (EMA handoff)
    leg(ALDI_CFG, common + ["OUTPUT_DIR", aldi_out,
                            "MODEL.WEIGHTS", burnin_ckpt] + da_opts)
    res["mean_pseudo_labels"] = round(check_not_vacuous(aldi_out), 2)
    res["aldi"] = _ap50s(leg(
        ALDI_CFG, common + ["OUTPUT_DIR", aldi_out,
                            "MODEL.WEIGHTS", burnin_ckpt] + da_opts,
        eval_only=True, resume=True)["results"])

    # arm C: distillation ablated
    nd = common + ["OUTPUT_DIR", nodistill_out,
                   "MODEL.WEIGHTS", burnin_ckpt] + da_opts + NO_DISTILL_OPTS
    leg(ALDI_CFG, nd)
    res["no_distill"] = _ap50s(leg(ALDI_CFG, nd, eval_only=True,
                                   resume=True)["results"])

    res["wall_s"] = round(time.time() - t0, 1)
    return res


def main():
    p = argparse.ArgumentParser(description="DAOD efficacy experiment")
    p.add_argument("--seeds", default="0,1")
    p.add_argument("--data-root", default="/tmp/aldi_shift/data")
    p.add_argument("--out-root", default="/tmp/aldi_shift/out")
    p.add_argument("--report", default=os.path.join(REPO, "EFFICACY.json"))
    # burn-in length calibrated to source saturation on the shift benchmark
    # (tools/calibrate: tgt AP50 plateaus by ~1200 while src sits ~95+)
    p.add_argument("--burnin", type=int, default=1200)
    # 1600: the round-4 length probe (STATUS.md) showed the distillation
    # effect separates cleanly from the DA-regimen effect only once the
    # continued-source arms start drifting (by ~1600 iters the no-distill
    # arm overfits source while distillation anchors the student to the
    # teacher's target-domain signal: +5.7/+9.6 AP50 across seeds); at 800
    # both DA arms still ride the regimen gain and the ablation is a wash
    p.add_argument("--da-iters", type=int, default=1600)
    p.add_argument("--threshold", type=float, default=None,
                   help="pin DOMAIN_ADAPT.TEACHER.THRESHOLD; default "
                        "calibrates per seed against the burn-in teacher")
    p.add_argument("--resume-report", default=None,
                   help="existing (partial) report JSON; its completed "
                        "seeds are kept and only missing seeds run")
    p.add_argument("--leg", default=None, help=argparse.SUPPRESS)
    p.add_argument("--leg-out", default=None, help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.leg is not None:  # child-process mode: run one leg and exit
        _leg_main(args)
        return

    # the shift benchmark JPEGs must exist before the legs run (each leg
    # re-registers against the same root, regenerating nothing)
    from tests.shift_benchmark import SHIFT, SPLITS, register_shift_benchmark

    register_shift_benchmark(args.data_root)

    seeds = [int(s) for s in args.seeds.split(",")]
    per_seed = {}
    if args.resume_report and os.path.exists(args.resume_report):
        with open(args.resume_report) as f:
            prior = json.load(f)
        per_seed = {k: v for k, v in prior.get("per_seed", {}).items()
                    if int(k) in seeds}
        if per_seed:
            print(f"resuming: keeping completed seeds "
                  f"{sorted(per_seed)} from {args.resume_report}",
                  flush=True)
    report = None
    for s in seeds:
        if str(s) not in per_seed:
            per_seed[str(s)] = run_seed(args.data_root, s, args.out_root,
                                        burnin=args.burnin,
                                        da_iters=args.da_iters,
                                        threshold=args.threshold)
            print(f"seed {s}: {json.dumps(per_seed[str(s)])}", flush=True)
        # crash-safe: the report is rewritten after every completed seed
        report = build_report(args, per_seed, [t for t in seeds
                                               if str(t) in per_seed],
                              SHIFT, SPLITS)
        with open(args.report, "w") as f:
            json.dump(report, f, indent=1)

    print(json.dumps({k: report[k] for k in (
        "target_ap50_gain_aldi_vs_source_only",
        "target_ap50_gain_no_distill",
        "target_ap50_gain_aldi_vs_no_distill",
        "mean_gain_aldi", "mean_gain_no_distill",
        "mean_gain_aldi_vs_no_distill",
        "seeds_where_distill_beats_ablation",
        "source_only_drift_from_burnin")}, indent=1))
    print(f"wrote {args.report}")


def build_report(args, per_seed, seeds, SHIFT, SPLITS):
    tgt = "shift_tgt_val"

    def col(arm):
        return [per_seed[str(s)][arm][tgt] for s in seeds]

    gains = [a - b for a, b in zip(col("aldi"), col("source_only"))]
    nd_gains = [a - b for a, b in zip(col("no_distill"), col("source_only"))]
    # the distillation-attributable delta: ALDI++ vs the equal-compute
    # no-distill DA control, per seed (VERDICT r4: the honest ablation —
    # the source-only control degrades from its own burn-in, so gains
    # measured against it conflate "DA helped" with "the control got worse")
    distill_delta = [a - b for a, b in zip(col("aldi"), col("no_distill"))]
    drift = [a - b for a, b in zip(col("source_only"), col("burnin"))]
    mean = lambda xs: round(sum(xs) / len(xs), 2)
    return {
        "benchmark": "synthetic shift (fog+blur+color-cast), "
                     "tests/shift_benchmark.py",
        "protocol": (
            f"burn-in {args.burnin} (source-saturated) -> "
            f"{{source-only +{args.da_iters} | ALDI++ {args.da_iters} | "
            f"no-distill {args.da_iters}}}; teacher threshold "
            f"{'pinned ' + str(args.threshold) if args.threshold is not None else 'calibrated per seed'}; "
            f"teacher-EMA AP50 on shift_tgt_val"
        ),
        "configs": ["configs/synthetic/Base-RCNN-FPN-Shift.yaml",
                    "configs/synthetic/ALDI-Shift.yaml"],
        "shift_params": SHIFT,
        "splits": {k: v[0] for k, v in SPLITS.items()},
        "jax_backend": _backend(),
        "per_seed": per_seed,
        "target_ap50_gain_aldi_vs_source_only": [round(g, 2) for g in gains],
        "target_ap50_gain_no_distill": [round(g, 2) for g in nd_gains],
        "target_ap50_gain_aldi_vs_no_distill": [round(g, 2)
                                                for g in distill_delta],
        "mean_gain_aldi": mean(gains),
        "mean_gain_no_distill": mean(nd_gains),
        "mean_gain_aldi_vs_no_distill": mean(distill_delta),
        "seeds_where_distill_beats_ablation":
            f"{sum(d > 0 for d in distill_delta)}/{len(distill_delta)}",
        # continued source-only training drifts off its own burn-in on the
        # target split; reported so the headline gain can be read honestly
        "source_only_drift_from_burnin": [round(d, 2) for d in drift],
    }


def _backend():
    import jax

    return jax.default_backend()


if __name__ == "__main__":
    main()
