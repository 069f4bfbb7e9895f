#!/usr/bin/env python3
"""Run selected bench.py rows and merge each into BENCH_FAMILIES.json as it
completes (crash-safe complement to tools/bench_all.py's full sweep: a row
that finishes is recorded even if a later row is cut off).

Usage: python tools/bench_rows.py TAG=ENV,ENV... [TAG=...]
  e.g.  python tools/bench_rows.py \
            kernels/numerics=BENCH_MODE=kernels \
            detr/train@800x1344=BENCH_FAMILY=detr,BENCH_CANVAS=800x1344
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "BENCH_FAMILIES.json")


def merge(row):
    rows = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows = json.load(f)
    rows = [r for r in rows if r.get("tag") != row["tag"]] + [row]
    with open(OUT, "w") as f:
        json.dump(rows, f, indent=1)


def main():
    for spec in sys.argv[1:]:
        tag, _, envspec = spec.partition("=")
        env = dict(os.environ)
        for kv in envspec.split(","):
            if kv:
                k, _, v = kv.partition("=")
                env[k] = v
        print(f"== {tag} ==", flush=True)
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                capture_output=True, text=True, env=env, cwd=ROOT,
                timeout=1500,
            )
        except subprocess.TimeoutExpired as e:
            merge({"tag": tag, "metric": tag,
                   "error": f"timeout after {e.timeout}s"})
            print(f"{tag}: timeout", flush=True)
            continue
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        try:
            parsed = json.loads(line)
            if not isinstance(parsed, dict):
                raise TypeError(f"bench.py emitted non-object JSON: {line!r}")
            row = {"tag": tag, **parsed}
        except (json.JSONDecodeError, IndexError, TypeError):
            row = {"tag": tag, "metric": tag, "error": (p.stderr or "")[-2000:]}
        merge(row)
        print(json.dumps(row)[:300], flush=True)


if __name__ == "__main__":
    main()
