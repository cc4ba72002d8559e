"""Dynamic-resolution sustained-FPS demo (the reference's product behavior).

The reference holds 60 fps by scaling render resolution inside a deadband
controller (reference: src/kernel.cu:78-114).  This demo drives the
engine's bucket controller against a 30-fps target (BASELINE.json north
star): start at the full render height, measure the real frame time,
step the resolution bucket by the controller's deadband rule until the
target holds, then keep rendering and log the sustained state.

Timing is HONEST on the axon dev tunnel (round-4/5 forensics):
  * frames are timed as CHAINED dispatches closed by a forced 1-pixel
    VALUE FETCH (block_until_ready can be a no-op), with the fetch
    round-trip calibrated out;
  * each bucket measures in a FRESH PROCESS: this dev tunnel's client
    degrades to ~400 ms/dispatch once a process loads a second frame
    executable (measured; a production host keeps every bucket hot in
    one process — engine._precompile_bucket_async exists for exactly
    that), so in-process bucket switching would time the RPC artifact,
    not the renderer.

The controller logic here mirrors Engine._dynamic_resolution_step:
step down when fps < target - deadband, step up when
fps > target + 4*deadband.

Usage:  python tools/fps_demo.py [--frames-per-bucket 24] [--out LOG]
Artifact: an FPS log (one JSON line per controller step) — committed as
resources/fps_demo_r5.log and summarized in README.md.
"""

import argparse
import json
import os
import subprocess
import sys

_BUCKETS = (270, 360, 540, 720, 1080, 1440, 2160)

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/rtrt_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
from rtrt_tpu.engine.engine import Engine
from rtrt_tpu.utils.config import DynamicResolution, GlobalSettings

h = {height}
w = (h * 16 // 9) // 16 * 16
eng = Engine(GlobalSettings(render_width=w, render_height=h,
                            scene={scene!r}, texture_size=256,
                            dynamic_resolution=DynamicResolution(
                                enabled=False)))

def fetch_scalar(arr):
    return float(jnp.asarray(arr[:1, :1, 0], jnp.float32)[0, 0])

img = eng.render_frame_device(dt=1 / 60)   # warm/compile
fetch_scalar(img)
t0 = time.perf_counter()
fetch_scalar(img)
rtt = time.perf_counter() - t0

fn = eng._frame_fns[eng._cur_bucket]
t0 = time.perf_counter()
for _ in range({frames}):
    img, new_state = fn(*eng._frame_args(1 / 60))
    eng.state = new_state
fetch_scalar(img)
ms = (time.perf_counter() - t0 - rtt) / {frames} * 1e3
print("BUCKET_RESULT " + json.dumps(
    dict(bucket_h=h, res=f"{{w}}x{{h}}", ms_per_frame=round(ms, 2),
         fps=round(1e3 / ms, 1))))
"""


def measure(height, scene, frames):
    code = _CHILD.format(repo=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), height=height, scene=scene,
        frames=frames)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("BUCKET_RESULT "):
            return json.loads(line[len("BUCKET_RESULT "):])
    raise RuntimeError(f"bucket {height} failed:\n{out.stdout}\n{out.stderr}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-per-bucket", type=int, default=24)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--scene", default="terrain")
    ap.add_argument("--target-fps", type=float, default=30.0)
    ap.add_argument("--deadband", type=float, default=2.0)
    ap.add_argument("--out", default="/tmp/fps_demo.log")
    args = ap.parse_args()

    idx = _BUCKETS.index(args.height)
    lines = []
    visited = {}
    while True:
        h = _BUCKETS[idx]
        rec = visited.get(h) or measure(h, args.scene,
                                        args.frames_per_bucket)
        first_visit = h not in visited
        visited[h] = rec
        fps = rec["fps"]
        if fps < args.target_fps - args.deadband and idx > 0:
            rec = dict(rec, controller="step_down")
            nxt = idx - 1
        elif fps > args.target_fps + 4 * args.deadband \
                and idx < len(_BUCKETS) - 1 \
                and _BUCKETS[idx + 1] <= args.height:
            rec = dict(rec, controller="step_up")
            nxt = idx + 1
        else:
            rec = dict(rec, controller="hold")
            nxt = idx
        lines.append(json.dumps(rec))
        print(lines[-1], flush=True)
        if nxt == idx or (not first_visit and _BUCKETS[nxt] in visited):
            # stable, or oscillating between two measured buckets: the
            # controller's resting state
            break
        idx = nxt

    # sustained confirmation: re-measure the resting bucket with a longer
    # run (the artifact the README row cites)
    rest = _BUCKETS[idx]
    rec = measure(rest, args.scene, args.frames_per_bucket * 3)
    rec["controller"] = "sustained"
    lines.append(json.dumps(rec))
    print(lines[-1], flush=True)

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"# sustained: {rec['res']} at {rec['fps']} fps "
          f"(target {args.target_fps}); log -> {args.out}")


if __name__ == "__main__":
    main()
