"""Probe: can a fetched (1,128) record row be consumed WITHOUT scalar
extracts via transpose + sublane-broadcast?

The traversal step's fixed ~0.4 us is suspected to be its 28-72 per-step
vector->scalar extracts (`row[0, k]` each syncs the vector and scalar
units; the r4 probe that measured them "cheap" used the broken
block-until-ready timing).  TPU alternative: one (128,128) transpose of
the row + one lane-broadcast gives X[k, l] = row[k]; record value k is
then the STATIC sublane slice X[k:k+1, :] — a (1,128) uniform vector that
sublane-broadcasts against (S,128) tiles.  Mosaic implements sublane-only
broadcasts (the unimplemented case is (1,1) -> both dims).

Measures a leaf-visit-like loop (8 MT tests consuming 9 values each) in
  extract : values via row[0, k] (the current kernel's form)
  xpose   : values via the transpose trick
Usage: python tools/probe_xpose.py [--rows 32] [--steps 300]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(mode, rows, steps, interpret):
    shape = (rows, 128)

    def kernel(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               out_ref, stack_ref):
        ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
        dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]

        def visit(base, best_t):
            row = tab_ref[pl.ds(base, 1), :]          # (1,128)
            if mode == "xpose":
                # X[k, l] = row[k] via a degenerate MXU outer product:
                # contract the two size-1 dims (no transpose, no
                # unsupported both-dims broadcast)
                x = jax.lax.dot_general(
                    row, jnp.ones((1, 128), row.dtype),
                    (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,  # exact f32 copy
                    preferred_element_type=jnp.float32)  # (128,128)
                lane = lambda k: x[k:k + 1, :]        # (1,128) uniform
            else:
                lane = lambda k: row[0, k]            # scalar extract
            gt = jnp.full(shape, jnp.inf, jnp.float32)
            for r in range(8):
                off = 16 * r
                v0x, v0y, v0z = lane(off), lane(off + 1), lane(off + 2)
                e1x, e1y, e1z = lane(off + 3), lane(off + 4), lane(off + 5)
                e2x, e2y, e2z = lane(off + 6), lane(off + 7), lane(off + 8)
                px, py, pz = ox - v0x, oy - v0y, oz - v0z
                hx = dy * e2z - dz * e2y
                hy = dz * e2x - dx * e2z
                hz = dx * e2y - dy * e2x
                det = e1x * hx + e1y * hy + e1z * hz
                uq = px * hx + py * hy + pz * hz
                qx = py * e1z - pz * e1y
                qy = pz * e1x - px * e1z
                qz = px * e1y - py * e1x
                vq = dx * qx + dy * qy + dz * qz
                tq = e2x * qx + e2y * qy + e2z * qz
                adet = jnp.abs(det)
                sg = jnp.sign(det)
                ok = (det != 0.0) & (uq * sg >= 0.0) & (vq * sg >= 0.0) \
                    & ((uq + vq) * sg <= adet) & (tq * sg < best_t * adet)
                inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
                tt = tq * inv
                gt = jnp.where(ok & (tt < gt), tt, gt)
            return jnp.minimum(best_t, gt)

        def body(s):
            k, best = s
            base = stack_ref[k % 128]
            best = visit(base, best)
            return k + 1, best

        def fill(i, _):
            stack_ref[i] = (i * 7) % 120
            return 0
        jax.lax.fori_loop(0, 128, fill, 0)
        out = jax.lax.while_loop(lambda s: s[0] < steps, body,
                                 (jnp.int32(0),
                                  jnp.full(shape, 1e9, jnp.float32)))
        out_ref[...] = out[1]

    return kernel


def run(mode, rows, steps, reps=10, interpret=False):
    shape = (rows, 128)
    tab = ((jnp.arange(128 * 128, dtype=jnp.float32) % 5.0)
           .reshape(128, 128)) * 0.3 - 0.5
    import numpy as np
    rng = np.random.default_rng(0)
    planes = [jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)
              for _ in range(6)]
    kern = make_kernel(mode, rows, steps, interpret)
    fn = jax.jit(lambda t, *p: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        scratch_shapes=[pltpu.SMEM((128,), jnp.int32)],
        interpret=interpret)(t, *p))
    r = fn(tab, *planes)
    from rtrt_tpu.utils.timing import fetch_rtt, force_ready
    best = float("inf")
    for _ in range(5):  # tunnel RTT is noisy: keep the best trial
        rtt = fetch_rtt(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(tab, *planes)
        force_ready(r)
        best = min(best, (time.perf_counter() - t0 - rtt) / reps / steps)
    return best * 1e9, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    import numpy as np
    outs = {}
    for mode in ("extract", "xpose"):
        ns, r = run(mode, args.rows, args.steps, interpret=args.interpret)
        outs[mode] = np.asarray(r)
        print(f"{mode:>8}: {ns:8.1f} ns/visit", flush=True)
    same = np.allclose(outs["extract"], outs["xpose"], rtol=1e-5, atol=1e-5)
    print("results match:", same)


if __name__ == "__main__":
    main()
