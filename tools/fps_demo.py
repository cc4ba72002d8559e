"""Dynamic-resolution sustained-FPS demo (the reference's product behavior).

The reference holds 60 fps by scaling render resolution inside a deadband
controller (reference: src/kernel.cu:78-114).  This demo drives the engine
the same way against a 30-fps target (BASELINE.json north star): start at
the full render height, measure real frame time, and let the controller
walk the resolution bucket until the target holds; then keep rendering and
log the sustained state.

Timing is HONEST on the axon dev tunnel: `block_until_ready()` can be a
no-op there (round-4 forensics), so frames are timed in chained chunks
closed by a forced 1-pixel VALUE FETCH, with the fetch round-trip
calibrated on an already-ready array and subtracted.  The controller is
fed the per-chunk mean frame time — the same signal a production host
gets from its frame fence.

Usage:  python tools/fps_demo.py [--frames 120] [--chunk 8] [--out LOG]
Artifact: an FPS log (one line per chunk) — committed as
resources/fps_demo_r5.log and summarized in README.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--scene", default="terrain")
    ap.add_argument("--target-fps", type=float, default=30.0)
    ap.add_argument("--out", default="/tmp/fps_demo.log")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    cache = os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.cache/rtrt_jax"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from rtrt_tpu.engine.engine import Engine
    from rtrt_tpu.utils.config import DynamicResolution, GlobalSettings

    w = (args.height * 16 // 9) // 16 * 16
    settings = GlobalSettings(
        render_width=w, render_height=args.height, scene=args.scene,
        texture_size=256,
        dynamic_resolution=DynamicResolution(
            enabled=True, target_fps=args.target_fps, deadband_fps=2.0))
    eng = Engine(settings)

    def fetch_scalar(arr):
        return float(jnp.asarray(arr[:1, :1, 0], jnp.float32)[0, 0])

    # warm the current bucket + fetch path, calibrate the fetch RTT
    img = eng.render_frame_device(dt=1 / 60)
    fetch_scalar(img)
    t0 = time.perf_counter()
    fetch_scalar(img)
    rtt = time.perf_counter() - t0

    lines = []
    frames_done = 0
    while frames_done < args.frames:
        bucket = eng._cur_bucket
        fn = eng._frame_fns[bucket]
        t0 = time.perf_counter()
        for _ in range(args.chunk):
            img, new_state = fn(*eng._frame_args(1 / 60))
            eng.state = new_state
            eng.prev_camera = eng.camera
        fetch_scalar(img)
        ms = (time.perf_counter() - t0 - rtt) / args.chunk * 1e3
        frames_done += args.chunk
        rec = {"frame": frames_done, "bucket_h": bucket,
               "res": f"{eng.render_w}x{eng.render_h}",
               "ms_per_frame": round(ms, 2), "fps": round(1e3 / ms, 1)}
        lines.append(json.dumps(rec))
        print(lines[-1], flush=True)
        # controller step on the measured (not wall-clock-polluted) time;
        # bucket switches compile synchronously here (one-time; the
        # background-precompile path needs free host threads, and this
        # demo prefers deterministic logs)
        eng._dynamic_resolution_step(ms / 1e3)
        if eng._cur_bucket != bucket and eng._cur_bucket in eng._frame_fns:
            # new bucket: re-warm its first frame outside the timed chunk
            img = eng.render_frame_device(dt=1 / 60)
            fetch_scalar(img)

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    sus = [json.loads(l) for l in lines[-5:]]
    print(f"# sustained: {sus[-1]['res']} at "
          f"{sum(s['fps'] for s in sus) / len(sus):.1f} fps "
          f"(target {args.target_fps}); log -> {args.out}")


if __name__ == "__main__":
    main()
