"""Probe: faithful replica of the packet kernel's LEAF VISIT.

The surgical A/Bs put a real leaf visit at ~2.5 us while every synthetic
probe of its pieces (extracts, conds, dense math) measures ~0.1 us.  This
probe rebuilds the leaf body VERBATIM — ray invariant planes, one dynamic
row read, 8 Moller-Trumbore record tests at static lane offsets, the
running-best select chain, the cross-lane prune-bound reduce, a scalar
carried bound, nested data-dependent conds, SMEM scratch — then strips
pieces one mode at a time to find the expensive ingredient.

Modes:
  full        the whole replica visit
  nored       no cross-lane jnp.max bound reduce (scalar carry dropped)
  noextr      record values replaced by literals (keeps all dense math)
  nomath      extracts kept, MT math replaced by a cheap combine
  nocond      full, but no cond wrappers
  rec2        only 2 records instead of 8

Usage: python tools/probe_leaf.py [--rows 32]
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

RAY_TMIN = 1e-4


def make_kernel(mode, rows, steps):
    shape = (rows, 128)
    nrec = 2 if mode == "rec2" else 8

    def kernel(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               out_ref, stack_ref):
        ox = ox_ref[...]
        oy = oy_ref[...]
        oz = oz_ref[...]
        dx = dx_ref[...]
        dy = dy_ref[...]
        dz = dz_ref[...]

        def tri_hit(v, best, off):
            if mode == "noextr":
                v0x, v0y, v0z = 0.1, 0.2, 0.3
                e1x, e1y, e1z = 1.0, 0.0, 0.1
                e2x, e2y, e2z = 0.0, 1.0, 0.1
            else:
                v0x, v0y, v0z = v[0, off], v[0, off + 1], v[0, off + 2]
                e1x, e1y, e1z = v[0, off + 3], v[0, off + 4], v[0, off + 5]
                e2x, e2y, e2z = v[0, off + 6], v[0, off + 7], v[0, off + 8]
            if mode == "nomath":
                tt = (ox * v0x + oy * v0y + oz * v0z
                      + dx * e1x + dy * e1y + dz * e1z + e2x)
                return tt > 0.5, tt
            px = ox - v0x
            py = oy - v0y
            pz = oz - v0z
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
            u_s = uq * sg
            v_s = vq * sg
            t_s = tq * sg
            ok = (det != 0.0) & (u_s >= 0.0) & (v_s >= 0.0) \
                & (u_s + v_s <= adet) \
                & (t_s > RAY_TMIN * adet) & (t_s < best * adet)
            inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
            return ok, tq * inv

        def leaf_visit(args):
            best_t, bound, base = args
            v8 = tab_ref[pl.ds(base, 1), :]
            gt = jnp.full(shape, jnp.inf, jnp.float32)
            for k in range(nrec):
                ok, tt = tri_hit(v8, best_t, 16 * k)
                gb = ok & (tt < gt)
                gt = jnp.where(gb, tt, gt)
            better = gt < best_t
            new_best = jnp.where(better, gt, best_t)
            if mode == "nored":
                return new_best, bound
            return new_best, jnp.max(new_best)

        def slab_like(a):
            # internal-visit-sized alternative branch (fat/alt modes):
            # ~4 slab tests + reduces, the other half of the real body
            best_t, bound = a
            nf = tab_ref[pl.ds(0, 1), :]
            rows_ = []
            for c in range(4):
                lo0, lo1, lo2 = nf[0, 6*c], nf[0, 6*c+1], nf[0, 6*c+2]
                hi0, hi1, hi2 = nf[0, 6*c+3], nf[0, 6*c+4], nf[0, 6*c+5]
                tn = jnp.maximum(jnp.maximum((lo0 - ox) * dx, (lo1 - oy) * dy),
                                 (lo2 - oz) * dz)
                tf = jnp.minimum(jnp.minimum((hi0 - ox) * dx, (hi1 - oy) * dy),
                                 (hi2 - oz) * dz)
                hit = (tn <= tf) & (tn < best_t)
                rows_.append(jnp.min(jnp.where(hit, tn, jnp.inf), axis=0,
                                     keepdims=True))
            m4 = jnp.min(jnp.concatenate(rows_, axis=0), axis=1)
            bound = jnp.minimum(bound, m4[0] + m4[1] + m4[2] + m4[3])
            return best_t, bound

        def body(s):
            k, best_t, bound = s
            if mode == "dep":
                # address depends on the PREVIOUS visit's cross-lane
                # reduce — the real pop's true data dependence (pushes ->
                # next pop address), which defeats scalar-unit run-ahead
                base = stack_ref[(k + jnp.int32(jnp.abs(bound)) % 7) % 128]
            else:
                base = stack_ref[k % 128]

            def visit(a):
                return leaf_visit(a + (base,))

            if mode == "nocond":
                best_t, bound = visit((best_t, bound))
            elif mode in ("fat", "carry4"):
                # the real kernel's shape: leaf/internal cond inside the
                # prune cond; carry4 additionally threads 4 planes
                if mode == "carry4":
                    extra = (best_t * 1.01, best_t * 1.02, best_t * 1.03)
                else:
                    extra = ()
                def inner(a):
                    return jax.lax.cond(base >= 120, 
                                        lambda b: slab_like(b[:2]) + b[2:],
                                        lambda b: leaf_visit(b[:2] + (base,)) + b[2:],
                                        a)
                out = jax.lax.cond(bound > -1e30, inner,
                                   lambda a: a, (best_t, bound) + extra)
                best_t, bound = out[0], out[1]
            else:
                def inner(a):
                    return jax.lax.cond(base >= 0, visit, lambda b: b, a)
                best_t, bound = jax.lax.cond(
                    bound > -1e30, inner, lambda a: a, (best_t, bound))
            return k + 1, best_t, bound

        def fill(i, _):
            stack_ref[i] = (i * 7) % 120
            return 0
        jax.lax.fori_loop(0, 128, fill, 0)
        init = (jnp.int32(0), jnp.full(shape, 1e9, jnp.float32),
                jnp.float32(1e9))
        out = jax.lax.while_loop(lambda s: s[0] < steps, body, init)
        out_ref[...] = out[1] + out[2]

    return kernel


def run(mode, rows, steps=400, reps=10):
    shape = (rows, 128)
    tab = ((jnp.arange(128 * 128, dtype=jnp.float32) % 5.0)
           .reshape(128, 128)) * 0.3 - 0.5
    import numpy as np
    rng = np.random.default_rng(0)
    planes = [jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)
              for _ in range(6)]
    kern = make_kernel(mode, rows, steps)
    fn = jax.jit(lambda t, *p: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        scratch_shapes=[pltpu.SMEM((128,), jnp.int32)])(t, *p))
    r = fn(tab, *planes)
    r.block_until_ready()
    from rtrt_tpu.utils.timing import fetch_rtt, force_ready
    rtt = fetch_rtt(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(tab, *planes)
    force_ready(r)
    return (time.perf_counter() - t0 - rtt) / reps / steps * 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32)
    args = ap.parse_args()
    for mode in ("full", "dep"):
        print(f"{mode:>7}: {run(mode, args.rows):8.1f} ns/visit",
              flush=True)


if __name__ == "__main__":
    main()
