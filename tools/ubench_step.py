"""Micro-benchmark: decompose the packet-traversal per-step cost on TPU.

The terrain trace runs ~275k tile-steps at ~1.15 us/step (tile (64,128));
the subtile sweep showed ~54% of that is FIXED per step (doesn't scale with
tile rows).  This tool times stripped-down Pallas while-loops that isolate
each suspected cost component:

  loop        empty while_loop (scalar carry only)
  fetch       + scalar dynamic-slice node fetch (pltpu.roll record fetch)
  slab        + dense 2-box slab test over the tile (no reductions)
  reduce2     + 2 cross-lane min reductions -> scalar (control syncs)
  reduce4     + 4 reductions (4-wide BVH control cost model)
  extract2    + 2 scalar extractions from the fetched row (child entries)
  carry4      slab + loop-carried state of 4 tile arrays (select each step)
  carry12     slab + 12 carried tile arrays (the current kernel's state)
  cond12      + the carried-state select under a lax.cond (visit/skip shape)

Usage: python tools/ubench_step.py [--steps 2000] [--rows 64]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(mode, steps, rows):
    shape = (rows, 128)

    def kernel(tab_ref, ox_ref, out_ref):
        ox = ox_ref[...]
        oy = ox * 1.1
        oz = ox * 0.9
        ix = 1.0 / (ox + 2.0)
        iy = 1.0 / (oy + 2.0)
        iz = 1.0 / (oz + 2.0)

        def fetch(i):
            row = tab_ref[pl.ds(i // 8, 1), :]
            sh = 16 * (i % 8)
            shift = jnp.where(sh == 0, 0, 128 - sh)
            return pltpu.roll(row, shift, 1)[0]

        def slab(nf, lo, best):
            tn = jnp.maximum(
                jnp.maximum((jnp.where(ix < 0, nf[lo + 3], nf[lo]) - ox) * ix,
                            (jnp.where(iy < 0, nf[lo + 4], nf[lo + 1]) - oy) * iy),
                (jnp.where(iz < 0, nf[lo + 5], nf[lo + 2]) - oz) * iz)
            tf = jnp.minimum(
                jnp.minimum((jnp.where(ix < 0, nf[lo], nf[lo + 3]) - ox) * ix,
                            (jnp.where(iy < 0, nf[lo + 1], nf[lo + 4]) - oy) * iy),
                (jnp.where(iz < 0, nf[lo + 2], nf[lo + 5]) - oz) * iz)
            hit = (tn <= tf) & (tf > 1e-4) & (tn < best)
            return hit, tn

        zf = jnp.zeros(shape, jnp.float32)
        best0 = jnp.full(shape, 1e9, jnp.float32)

        if mode in ("loop", "fetch", "slab", "reduce2", "reduce4", "extract2"):
            # acc is a FULL (rows,128) tile and every mode folds its whole
            # result into it — XLA cannot slice/DCE the body (the first
            # version accumulated scalars and measured nothing: "slab" timed
            # 7 ns/step, 35x under the VPU floor for 2 slab tests)
            def body(s):
                k, acc = s
                if mode == "loop":
                    return k + 1, acc + 1.0
                nf = fetch(k & 1023)
                if mode == "fetch":
                    return k + 1, acc + nf[0]
                hl, tl = slab(nf, 0, 1e9)
                hr, tr = slab(nf, 6, 1e9)
                live = jnp.where(hl, tl, 0.0) + jnp.where(hr, tr, 0.0)
                if mode == "slab":
                    return k + 1, acc + live
                if mode == "extract2":
                    return k + 1, acc + live + nf[0] + nf[6]
                minl = jnp.min(jnp.where(hl, tl, jnp.inf))
                minr = jnp.min(jnp.where(hr, tr, jnp.inf))
                if mode == "reduce2":
                    return k + 1, acc + live + jnp.where(minl < minr, 1.0, 2.0)
                hl2, tl2 = slab(nf, 3, 1e9)
                hr2, tr2 = slab(nf, 9, 1e9)
                live = live + jnp.where(hl2, tl2, 0.0) + jnp.where(hr2, tr2, 0.0)
                m3 = jnp.min(jnp.where(hl2, tl2, jnp.inf))
                m4 = jnp.min(jnp.where(hr2, tr2, jnp.inf))
                return k + 1, acc + live + jnp.where(minl < minr, 1.0, 2.0) \
                    + jnp.where(m3 < m4, 1.0, 2.0)

            out = jax.lax.while_loop(
                lambda s: s[0] < steps, body,
                (jnp.int32(0), jnp.zeros(shape, jnp.float32)))
            out_ref[...] = ox + out[1]
            return

        n_carry = 4 if mode == "carry4" else 12
        init = (jnp.int32(0), best0) + tuple(
            zf + float(i) for i in range(n_carry - 1))

        def body(s):
            k = s[0]
            best = s[1]
            rest = s[2:]
            nf = fetch(k & 1023)
            hl, tl = slab(nf, 0, 1e9)
            hr, tr = slab(nf, 6, 1e9)

            def update(args):
                best, *rest = args
                nb = jnp.where(hl, jnp.minimum(best, tl), best)
                nr = [jnp.where(hr, r + tr, r) for r in rest]
                return (nb, *nr)

            if mode == "cond12":
                out = jax.lax.cond(nf[0] < 1e30, update,
                                   lambda a: a, (best,) + rest)
            else:
                out = update((best,) + rest)
            return (k + 1,) + out

        out = jax.lax.while_loop(lambda s: s[0] < steps, body, init)
        out_ref[...] = out[1] + out[2]

    return kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    rows = args.rows
    shape = (rows, 128)
    tab = jnp.arange(128 * 128, dtype=jnp.float32).reshape(128, 128)
    ox = jnp.linspace(0, 1, rows * 128).reshape(shape)

    modes = ["loop", "fetch", "slab", "extract2", "reduce2", "reduce4",
             "carry4", "carry12", "cond12"]
    print(f"rows={rows} steps={args.steps} reps={args.reps}")
    base = None
    for mode in modes:
        kern = make_kernel(mode, args.steps, rows)
        fn = jax.jit(lambda t, o: pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(t, o))
        r = fn(tab, ox)
        r.block_until_ready()
        from rtrt_tpu.utils.timing import fetch_rtt, force_ready
        rtt = fetch_rtt(r)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = fn(tab, ox)
        force_ready(r)
        dt = (time.perf_counter() - t0 - rtt) / args.reps
        ns = dt / args.steps * 1e9
        d = "" if base is None else f"  (+{ns - base:6.1f} vs loop)"
        if mode == "loop":
            base = ns
        print(f"{mode:<10} {ns:8.1f} ns/step{d}")


if __name__ == "__main__":
    main()
