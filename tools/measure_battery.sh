#!/bin/sh
# TPU measurement battery — run when a real chip is attached.
# Collects everything the perf plan needs in one pass; each step is
# independently skippable.  Results land in /tmp/rtrt_measure/.
set -x
OUT=${1:-/tmp/rtrt_measure}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# 1. headline + scale benches (persistent compile cache warms itself)
BENCH_SCENE=terrain  python bench.py  | tee "$OUT/bench_terrain.json"
BENCH_SCENE=demo     python bench.py  | tee "$OUT/bench_demo.json"
BENCH_SCENE=terrain_big python bench.py | tee "$OUT/bench_terrain_big.json"

# 2. per-stage cuts (bvh/trace/denoise/full)
python tools/profile_frame.py --scene terrain --frames 5 \
    | tee "$OUT/stages_terrain.txt"

# 3. per-segment step unions: whole-tile vs strip sub-tiling
python tools/profile_frame.py --scene terrain --trace-steps \
    | tee "$OUT/steps_sub0.txt"
RTRT_BOUNCE_SUBTILE=8 python tools/profile_frame.py --scene terrain \
    --trace-steps | tee "$OUT/steps_sub8.txt"
RTRT_BOUNCE_SUBTILE=16 python tools/profile_frame.py --scene terrain \
    --trace-steps | tee "$OUT/steps_sub16.txt"

# 4. wall-clock: does sub-tiling pay at 1080p?
RTRT_BOUNCE_SUBTILE=8  BENCH_SCENE=terrain python bench.py \
    | tee "$OUT/bench_terrain_sub8.json"
RTRT_BOUNCE_SUBTILE=16 BENCH_SCENE=terrain python bench.py \
    | tee "$OUT/bench_terrain_sub16.json"

# 5. tile-shape sweep (fresh subprocess per shape)
python tools/tune_tile.py | tee "$OUT/tile_sweep.txt"

# 6. TPU-only test gates (packet kernel vs oracle on hardware)
python -m pytest tests/test_packet_tpu.py tests/test_megakernel.py -q \
    | tee "$OUT/tpu_tests.txt"
