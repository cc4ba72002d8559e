"""Sweep packet TILE_SHAPE on real hardware and report ms/frame.

TILE_SHAPE trades per-tile traversal-union size (bigger pixel blocks union
more BVH subtrees) against grid/launch overhead.  Runs each candidate in a
SUBPROCESS (the shape is an import-time constant; a fresh interpreter per
candidate keeps the jit caches honest).

Usage:
    python tools/tune_tile.py [--scene terrain] [--width 1920]
        [--height 1080] [--frames 5] [--shapes 64x128,32x256,16x512,8x128]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/rtrt_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from rtrt_tpu.engine.engine import Engine
from rtrt_tpu.utils.config import DynamicResolution, GlobalSettings

eng = Engine(GlobalSettings(render_width={w}, render_height={h},
                            scene={scene!r}, texture_size=256,
                            dynamic_resolution=DynamicResolution(
                                enabled=False)))
from rtrt_tpu.utils.timing import fetch_rtt, force_ready
jax.block_until_ready(eng.render_frame_device(dt=1 / 60))
img = eng.render_frame_device(dt=1 / 60)
rtt = fetch_rtt(img)   # block_until_ready is a NO-OP on the axon tunnel
t0 = time.perf_counter()
for _ in range({frames}):
    img = eng.render_frame_device(dt=1 / 60)
force_ready(img)       # forced value fetch: cannot be skipped
ms = (time.perf_counter() - t0 - rtt) / {frames} * 1e3
print("TUNE_RESULT " + json.dumps(dict(shape=os.environ["RTRT_TILE_SHAPE"],
                                       ms=round(ms, 2))))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="terrain")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--shapes",
                    default="64x128,32x256,16x512,32x128,16x256,8x128")
    args = ap.parse_args()

    results = []
    for shape in args.shapes.split(","):
        env = dict(os.environ, RTRT_TILE_SHAPE=shape.strip())
        code = _CHILD.format(repo=REPO, w=args.width, h=args.height,
                             scene=args.scene, frames=args.frames)
        p = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=3600)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("TUNE_RESULT ")]
        if line:
            r = json.loads(line[0][len("TUNE_RESULT "):])
            results.append(r)
            print(f"{r['shape']:>10}: {r['ms']:8.2f} ms/frame")
        else:
            print(f"{shape:>10}: FAILED\n{p.stderr[-500:]}")
    if results:
        best = min(results, key=lambda r: r["ms"])
        print(f"\nbest: {best['shape']} @ {best['ms']} ms")


if __name__ == "__main__":
    main()
