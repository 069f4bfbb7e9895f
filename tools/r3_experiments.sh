#!/bin/bash
# Round-3 queued TPU bench experiments (memory: round3-state). Runs the whole
# queue sequentially in one tunnel window; each row appends a JSON line to
# $OUT. Safe to re-run — rows are tagged. Requires the axon TPU tunnel up.
#
# Usage: bash tools/r3_experiments.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r3_experiments.jsonl}

run() {
  local tag="$1"; shift
  echo "== $tag ==" >&2
  local line
  line=$(env "$@" timeout 2400 python bench.py 2>/tmp/r3_exp_err.log | tail -1)
  if [ -z "$line" ]; then
    echo "{\"tag\": \"$tag\", \"error\": \"no output (see /tmp/r3_exp_err.log)\"}" | tee -a "$OUT"
    tail -5 /tmp/r3_exp_err.log >&2
  else
    echo "{\"tag\": \"$tag\", \"row\": $line}" | tee -a "$OUT"
  fi
}

# 0. serving-path row (new in r3, never measured on TPU)
run rcnn/infer BENCH_MODE=infer

# 1. flagship: does stream-seq backward buy batch 5 (monolithic b5 OOMs by 21 MB)?
run rcnn/b5-streamseq BENCH_BATCH_PER_CHIP=5 BENCH_BACKWARD_AT_END=0
run rcnn/b6-streamseq BENCH_BATCH_PER_CHIP=6 BENCH_BACKWARD_AT_END=0
# control: stream-seq at the current-best batch 4 (overhead measurement)
run rcnn/b4-streamseq BENCH_BATCH_PER_CHIP=4 BENCH_BACKWARD_AT_END=0

# 2. ViTDet 1024x1024 with stream-seq headroom (current row: b1 monolithic)
run vitdet/1024sq-b2-streamseq BENCH_FAMILY=vitdet BENCH_BATCH_PER_CHIP=2 BENCH_BACKWARD_AT_END=0

# 3. ViTDet benchmark canvas at batch 3 (b2 landed 2.72; run died at b3 last time)
run vitdet/2048-b3-streamseq BENCH_FAMILY=vitdet BENCH_CANVAS=1024x2048 BENCH_BATCH_PER_CHIP=3 BENCH_BACKWARD_AT_END=0

# 4. ConvNeXt batch scaling with stream-seq
run convnext/b4-streamseq BENCH_FAMILY=convnext BENCH_BATCH_PER_CHIP=4 BENCH_BACKWARD_AT_END=0

# 5. YOLO batch 4 (current row b2)
run yolo/b4 BENCH_FAMILY=yolo BENCH_BATCH_PER_CHIP=4

echo "done -> $OUT" >&2
