#!/bin/sh
# Round-4 trace-stage attribution battery (VERDICT r3 "do this" item 1).
# Splits the ~133 ms trace stage across its four cost planes via flag A/Bs:
#   resolve loop  -> RTRT_LEAN_ATTRS=0 (attrs carried in the find loop)
#   proctex       -> RTRT_PROCTEX=0   (in-kernel soil shading off)
#   bounce depth  -> RTRT_SEGMENTS=1/3 (primary only / drop last 2)
#   per-step cost -> tools/ubench_step.py (DCE-fixed microbench)
# Results land in $OUT; each step is a fresh subprocess (env read at import).
set -x
OUT=${1:-/tmp/rtrt_attr}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

BENCH_SCENE=terrain python bench.py 2>"$OUT/baseline.err" | tee "$OUT/baseline.json"
RTRT_SEGMENTS=1 BENCH_SCENE=terrain python bench.py 2>"$OUT/seg1.err" | tee "$OUT/seg1.json"
RTRT_SEGMENTS=3 BENCH_SCENE=terrain python bench.py 2>"$OUT/seg3.err" | tee "$OUT/seg3.json"
RTRT_PROCTEX=0 BENCH_SCENE=terrain python bench.py 2>"$OUT/noproctex.err" | tee "$OUT/noproctex.json"
RTRT_LEAN_ATTRS=0 BENCH_SCENE=terrain python bench.py 2>"$OUT/nolean.err" | tee "$OUT/nolean.json"
python tools/ubench_step.py --rows 64 2>"$OUT/ubench64.err" | tee "$OUT/ubench_rows64.txt"
python tools/ubench_step.py --rows 32 2>"$OUT/ubench32.err" | tee "$OUT/ubench_rows32.txt"
echo DONE
