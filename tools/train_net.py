#!/usr/bin/env python3
"""Training/evaluation entry point, CLI-compatible with the reference's
``tools/train_net.py`` (``--config-file``, ``--eval-only``, ``--resume``,
trailing ``KEY VALUE`` overrides; reference ``tools/train_net.py:26-98``).

Multi-device launch differences by design: there is no process-per-GPU
spawn — one process drives the whole TPU slice via a device mesh
(``--num-gpus``/``--num-machines``/``--machine-rank``/``--dist-url`` are
accepted for drop-in compatibility and ignored on a single host; multi-host
TPU pods initialize via ``jax.distributed`` when the standard TPU env is
present).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def default_argument_parser():
    p = argparse.ArgumentParser(description="aldi_tpu training")
    p.add_argument("--config-file", "--config", default="", metavar="FILE")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    # accepted for reference CLI compatibility; mesh handles parallelism
    p.add_argument("--num-gpus", type=int, default=1)
    p.add_argument("--num-machines", type=int, default=1)
    p.add_argument("--machine-rank", type=int, default=0)
    p.add_argument("--dist-url", default="auto")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="KEY VALUE config overrides")
    return p


def setup(args):
    from aldi_tpu.config import get_cfg

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    return cfg


def verify_results(cfg, results) -> bool:
    """Substrate ``verify_results`` (consumed at reference
    ``tools/train_net.py:79-80``): check TEST.EXPECTED_RESULTS entries
    [dataset, metric, expected, tolerance] against eval output."""
    ok = True
    for dataset, metric, expected, tolerance in cfg.TEST.EXPECTED_RESULTS:
        actual = results.get(dataset, {}).get(metric)
        if actual is None or abs(actual - expected) > tolerance:
            print(
                f"verify_results FAIL: {dataset}/{metric} = {actual} "
                f"(expected {expected} +/- {tolerance})"
            )
            ok = False
        else:
            print(f"verify_results OK: {dataset}/{metric} = {actual}")
    return ok


def main(args):
    cfg = setup(args)
    from aldi_tpu.engine.trainer import ALDITrainer

    trainer = ALDITrainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    if args.eval_only:
        results = trainer.test()
        print(results)
        if cfg.TEST.EXPECTED_RESULTS:
            assert verify_results(cfg, results)
        return results
    return trainer.train()


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
