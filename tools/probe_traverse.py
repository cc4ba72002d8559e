"""Marginal per-step cost of the REAL packet traversal loop.

Runs the standalone packet kernel (bvh/packet.py::packet_intersect) on the
terrain scene's real SAH/BVH4 tables with real 1080p primary rays, at two
different max_steps caps.  Same kernel structure, different trip counts:
    marginal cost/step = (t(capB) - t(capA)) / (stepsB - stepsA)
with steps counted exactly (every tile saturates caps this small).  This
is the number the synthetic ubenches kept failing to produce (they
measured only hoistable/pipelinable bodies); here the loop is the real
one — nested visit conds, SMEM stack, leaf rows, carried hit state.

Usage: python tools/probe_traverse.py [--rows 64] [--caps 24,48,96]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", default="24,48,96,192")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--lean", action="store_true",
                    help="lean find loop (best/tri/u/v carries only) — the "
                         "megakernel's configuration (its resolve loop runs "
                         "too, but is ~ns-scale).  Strip shapes: set "
                         "RTRT_TILE_SHAPE=8x128 etc. before launch.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.environ.get("JAX_CACHE_DIR",
                               os.path.expanduser("~/.cache/rtrt_jax"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from rtrt_tpu.bvh.packet import TILE, pack_for_packets, packet_intersect
    from rtrt_tpu.core.camera import camera_basis
    from rtrt_tpu.engine.engine import Engine
    from rtrt_tpu.render.raygen import generate_rays_padded, pixel_grid
    from rtrt_tpu.utils.config import DynamicResolution, GlobalSettings

    w, h = 1920, 1080
    settings = GlobalSettings(render_width=w, render_height=h,
                              scene="terrain", texture_size=64,
                              dynamic_resolution=DynamicResolution(
                                  enabled=False))
    eng = Engine(settings)
    bvh, nrm_t, mat_s, nodes4 = eng.prebuilt
    tables = pack_for_packets(bvh, nrm_t, mat_s)
    arity = 2
    if nodes4 is not None:
        tables = tables._replace(nodes_f32=nodes4)
        arity = 4

    n_pix = w * h
    n_pad = -(-n_pix // TILE) * TILE
    pixel_ids = jnp.minimum(jnp.arange(n_pad, dtype=jnp.int32), n_pix - 1)
    basis = camera_basis(eng.camera)
    jitter = jnp.full((n_pad, 2), 0.5, jnp.float32)
    rays = generate_rays_padded(basis, w, h, pixel_ids, jitter, jitter)

    n_tiles = n_pad // TILE
    results = []
    for cap in [int(c) for c in args.caps.split(",")]:
        # raise the scoped-VMEM limit like the megakernel frame does —
        # with the default 16 MiB budget the row-per-record node table
        # pushed the staging scratch out of VMEM and the probe measured
        # an HBM-resident kernel (~250 us/tile of phantom DMA)
        fn = jax.jit(lambda o, d, cap=cap: packet_intersect(
            tables, o, d, tlas_internal=max(0, bvh.tlas_internal),
            max_steps=cap, arity=arity, leaf_width=eng._sah_leaf,
            lean=args.lean, count_steps=True),
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "114688"})
        r = fn(rays.org, rays.dir)
        jax.block_until_ready(r)
        # exact executed-step count: the kernel writes each tile's loop
        # count into the mat plane (uniform within a tile)
        steps = int(np.asarray(r.mat).reshape(n_tiles, TILE)[:, 0].sum())
        # forced-fetch timing (block_until_ready is a NO-OP on the axon
        # tunnel — utils/timing.py); dispatches serialize on the one core
        from rtrt_tpu.utils.timing import fetch_rtt, force_ready
        rtt = fetch_rtt(r.t)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = fn(rays.org, rays.dir)
        force_ready(r.t)
        dt = (time.perf_counter() - t0 - rtt) / args.reps
        results.append((cap, dt, steps))
        print(f"cap={cap:4d}: {dt * 1e3:8.2f} ms  {steps:7d} steps "
              f"({n_tiles} tiles)", flush=True)

    for (c1, t1, s1), (c2, t2, s2) in zip(results, results[1:]):
        ns = (t2 - t1) / (s2 - s1) * 1e9
        print(f"marginal cost/step between cap {c1} and {c2}: {ns:8.1f} ns")


if __name__ == "__main__":
    main()
