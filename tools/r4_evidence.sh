#!/bin/sh
# Round-4 closing evidence battery (run on the v5e).
# Results in $OUT; each step independently skippable.
set -x
OUT=${1:-/tmp/rtrt_r4}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# 1. final-config headline + bounce-subtile check at the new 32-row tile
BENCH_SCENE=terrain python bench.py >"$OUT/headline.json" 2>"$OUT/headline.err"
RTRT_BOUNCE_SUBTILE=16 BENCH_SCENE=terrain python bench.py \
    >"$OUT/sub16.json" 2>"$OUT/sub16.err"

# 2. scene envelope at the final config
BENCH_SCENE=terrain_big python bench.py >"$OUT/big.json" 2>"$OUT/big.err"
BENCH_SCENE=terrain_huge python bench.py >"$OUT/huge.json" 2>"$OUT/huge.err"
ANIMATION=wave BENCH_SCENE=terrain python bench.py \
    >"$OUT/animated.json" 2>"$OUT/animated.err"

# 3. stack-drop telemetry at the 1M-tri envelope (must be all-zero)
RTRT_COUNT=drops python tools/profile_frame.py --scene terrain_huge \
    --trace-steps >"$OUT/drops_huge.txt" 2>"$OUT/drops_huge.err"

# 4. wavefront fallback: one recorded number (VERDICT r3 item 7)
RTRT_VMEM_TABLE_BUDGET_MB=1 BENCH_FRAMES=3 BENCH_SCENE=terrain \
    python bench.py >"$OUT/wavefront.json" 2>"$OUT/wavefront.err"

# 5. product-resolution quality evidence with the CORRECTED SSIM metric
python tools/quality_1080p.py --spp 48 --frames 32 \
    >"$OUT/quality_1080p.txt" 2>"$OUT/quality_1080p.err"

echo DONE
