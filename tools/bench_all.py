#!/usr/bin/env python3
"""Sweep bench.py across model families + the teacher-latency row.

Each row runs in a fresh subprocess (one live XLA program at a time keeps
HBM headroom honest). Writes BENCH_FAMILIES.json at the repo root and prints
a table. The driver's headline metric stays `python bench.py` (flagship).

Usage: python tools/bench_all.py [--families rcnn,vitdet,yolo,detr]
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_row(family, mode="train", extra_env=None):
    env = dict(os.environ)
    env["BENCH_FAMILY"] = family
    env["BENCH_MODE"] = mode
    env.update(extra_env or {})
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, env=env, cwd=ROOT,
    )
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
    try:
        return json.loads(line)
    except (json.JSONDecodeError, IndexError):
        return {"metric": f"{family}/{mode}", "error": (p.stderr or "")[-2000:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="rcnn,vitdet,convnext,yolo,detr")
    ap.add_argument("--modes", default="train,infer",
                    help="per-family rows to collect (train and/or infer)")
    ap.add_argument("--teacher", action="store_true", default=True)
    ap.add_argument("--no-teacher", dest="teacher", action="store_false")
    ap.add_argument("--no-loader", dest="loader", action="store_false",
                    default=True)
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_FAMILIES.json"))
    args = ap.parse_args()
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]

    # merge with any existing file so partial re-runs (e.g. one family)
    # never drop the other rows; rows are keyed by family/mode tag
    old = []
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                old = json.load(f)
        except (json.JSONDecodeError, OSError):
            old = []

    # per-family extra rows beyond the default recipe: ViTDet at the full
    # 1024x2048 benchmark canvas fits HBM only via the stream-sequential
    # backward (SOLVER.BACKWARD_AT_END=False), where batch 2+2 beats the
    # monolithic-backward batch-1 recipe by ~27%
    extra_rows = {
        "vitdet": [("train@1024x2048", "train", {
            "BENCH_CANVAS": "1024x2048",
            "BENCH_BATCH_PER_CHIP": "2",
            "BENCH_BACKWARD_AT_END": "0",
        })],
    }

    rows = []
    for fam in args.families.split(","):
        fam = fam.strip()
        if not fam:
            continue
        for mode in modes:
            print(f"== {fam} {mode} step ==", flush=True)
            rows.append({"tag": f"{fam}/{mode}", **run_row(fam, mode)})
            print(json.dumps(rows[-1]), flush=True)
        if "train" in modes:
            for suffix, mode, env in extra_rows.get(fam, []):
                print(f"== {fam} {suffix} ==", flush=True)
                rows.append(
                    {"tag": f"{fam}/{suffix}", **run_row(fam, mode, env)})
                print(json.dumps(rows[-1]), flush=True)
    if args.teacher:
        print("== teacher latency (flagship) ==", flush=True)
        rows.append({"tag": "rcnn/teacher", **run_row("rcnn", "teacher")})
        print(json.dumps(rows[-1]), flush=True)
    if args.loader:
        print("== host loader throughput ==", flush=True)
        rows.append({
            "tag": "host/loader",
            **run_row("rcnn", "loader", {"BENCH_LOADER_THREADS": "1"}),
        })
        print(json.dumps(rows[-1]), flush=True)

    fresh = {r["tag"] for r in rows}
    keep = [r for r in old if r.get("tag") not in fresh]
    rows = keep + rows

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"\nwrote {args.out}")
    for r in rows:
        if "error" in r:
            print(f"  {r['metric']:70s}  ERROR")
        else:
            print(f"  {r['metric']:70s}  {r['value']} {r['unit']}")


if __name__ == "__main__":
    main()
