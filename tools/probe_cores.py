"""Probe: CO-RESIDENCE — does putting the FULL internal-visit machinery in
the same while body as the leaf visit recreate the real kernel's ~2.5 us
leaf cost?

Every isolated replica of the leaf visit runs at ~0.1 us; the real kernel
measures ~2.5 us.  The one structural difference left is that the real
loop body also contains the complete internal visit: 4 slab tests with
per-child lane extracts, a 5-comparator scalar sort network, dual SMEM
stack pushes (stack + tstack), predicated pops, a drops counter, and the
10-tuple loop carry.  This probe is the full traversal step — BOTH
bodies, faithful pop/push — over a synthetic tree laid out in SMEM.

Modes:
  both     full co-resident step (leaf/internal by data, conds)
  leafonly same loop, internal branch gutted
  intonly  same loop, leaf branch gutted

Usage: python tools/probe_cores.py [--rows 32]
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
STACK = 256


def make_kernel(mode, rows, steps):
    shape = (rows, 128)

    def kernel(ntab_ref, ttab_ref, ox_ref, oy_ref, oz_ref,
               dx_ref, dy_ref, dz_ref, out_ref, stack_ref, tstack_ref):
        ox = ox_ref[...]
        oy = oy_ref[...]
        oz = oz_ref[...]
        dx = dx_ref[...]
        dy = dy_ref[...]
        dz = dz_ref[...]
        ix = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)

        def slab(lo0, lo1, lo2, hi0, hi1, hi2, best):
            tn = jnp.maximum(
                jnp.maximum((jnp.where(ix < 0, hi0, lo0) - ox) * ix,
                            (jnp.where(iy < 0, hi1, lo1) - oy) * iy),
                (jnp.where(iz < 0, hi2, lo2) - oz) * iz)
            tf = jnp.minimum(
                jnp.minimum((jnp.where(ix < 0, lo0, hi0) - ox) * ix,
                            (jnp.where(iy < 0, lo1, hi1) - oy) * iy),
                (jnp.where(iz < 0, lo2, hi2) - oz) * iz)
            hit = (tn <= tf) & (tf > RAY_TMIN) & (tn < best)
            return hit, tn

        def tri_hit(v, best, off):
            v0x, v0y, v0z = v[0, off], v[0, off + 1], v[0, off + 2]
            e1x, e1y, e1z = v[0, off + 3], v[0, off + 4], v[0, off + 5]
            e2x, e2y, e2z = v[0, off + 6], v[0, off + 7], v[0, off + 8]
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
            ok = (det != 0.0) & (uq * sg >= 0.0) & (vq * sg >= 0.0) \
                & (uq * sg + vq * sg <= adet) \
                & (tq * sg > RAY_TMIN * adet) & (tq * sg < best * adet)
            inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
            return ok, tq * inv

        def leaf_body(cur, best_t, tri, bound):
            base = (cur & 1023)
            blk = ttab_ref[pl.ds(base // 8, 1), :]
            gt = jnp.full(shape, jnp.inf, jnp.float32)
            gi = jnp.zeros(shape, jnp.int32)
            for k in range(8):
                ok, tt = tri_hit(blk, best_t, 16 * k)
                gb = ok & (tt < gt)
                gt = jnp.where(gb, tt, gt)
                gi = jnp.where(gb, base + k, gi)
            better = gt < best_t
            nb = jnp.where(better, gt, best_t)
            return nb, jnp.where(better, gi, tri), jnp.max(nb)

        def visit_internal(sp, cur, best_t, tri, bound, drops):
            row = cur & 511
            nf = ntab_ref[pl.ds(row, 1), :]
            es, rows_ = [], []
            for c in range(4):
                h_c, t_c = slab(nf[0, 6 * c], nf[0, 6 * c + 1],
                                nf[0, 6 * c + 2], nf[0, 6 * c + 3],
                                nf[0, 6 * c + 4], nf[0, 6 * c + 5], best_t)
                rows_.append(jnp.min(jnp.where(h_c, t_c, jnp.inf), axis=0,
                                     keepdims=True))
                es.append(nf[0, 24 + c].astype(jnp.int32))
            m4 = jnp.min(jnp.concatenate(rows_, axis=0), axis=1)
            pairs = [(m4[c], es[c]) for c in range(4)]

            def cswap(a, b):
                sw = a[0] > b[0]
                return ((jnp.where(sw, b[0], a[0]), jnp.where(sw, b[1], a[1])),
                        (jnp.where(sw, a[0], b[0]), jnp.where(sw, a[1], b[1])))

            p0, p1, p2, p3 = pairs
            p0, p1 = cswap(p0, p1)
            p2, p3 = cswap(p2, p3)
            p0, p2 = cswap(p0, p2)
            p1, p3 = cswap(p1, p3)
            p1, p2 = cswap(p1, p2)
            c3 = ((p3[0] < jnp.inf) & (sp < STACK)).astype(jnp.int32)
            w3 = jnp.minimum(sp, STACK - 1)
            stack_ref[w3] = jnp.where(c3 > 0, p3[1], stack_ref[w3])
            tstack_ref[w3] = jnp.where(c3 > 0, p3[0], tstack_ref[w3])
            c2 = ((p2[0] < jnp.inf) & (sp + c3 < STACK)).astype(jnp.int32)
            w2 = jnp.minimum(sp + c3, STACK - 1)
            stack_ref[w2] = jnp.where(c2 > 0, p2[1], stack_ref[w2])
            tstack_ref[w2] = jnp.where(c2 > 0, p2[0], tstack_ref[w2])
            c1 = ((p1[0] < jnp.inf) & (sp + c3 + c2 < STACK)).astype(jnp.int32)
            w1 = jnp.minimum(sp + c3 + c2, STACK - 1)
            stack_ref[w1] = jnp.where(c1 > 0, p1[1], stack_ref[w1])
            tstack_ref[w1] = jnp.where(c1 > 0, p1[0], tstack_ref[w1])
            drops = drops + ((p3[0] < jnp.inf) & (c3 == 0)).astype(jnp.int32)
            sp = sp + c1 + c2 + c3
            return sp, best_t, tri, bound, drops

        def body(s):
            k, sp, best_t, tri, bound, drops = s
            top = stack_ref[jnp.maximum(sp - 1, 0)]
            topt = tstack_ref[jnp.maximum(sp - 1, 0)]
            cur = top
            sp = jnp.maximum(sp - 1, 0)

            def vleaf(a):
                sp, best_t, tri, bound, drops = a
                nb, nt, nbound = leaf_body(cur, best_t, tri, bound)
                return sp, nb, nt, nbound, drops

            def vint(a):
                sp, best_t, tri, bound, drops = a
                return visit_internal(sp, cur, best_t, tri, bound, drops)

            if mode == "depcond":
                def visit(a):
                    return jax.lax.cond((cur & 1024) != 0, vleaf, vint, a)
                out = jax.lax.cond(topt < bound, visit, lambda a: a,
                                   (sp, best_t, tri, bound, drops))
            elif mode == "leafonly":
                out = jax.lax.cond(topt < bound, vleaf, lambda a: a,
                                   (sp, best_t, tri, bound, drops))
            elif mode == "intonly":
                out = jax.lax.cond(topt < bound, vint, lambda a: a,
                                   (sp, best_t, tri, bound, drops))
            else:
                def visit(a):
                    return jax.lax.cond((cur & 1024) != 0, vleaf, vint, a)
                out = jax.lax.cond(topt < bound, visit, lambda a: a,
                                   (sp, best_t, tri, bound, drops))
            sp, best_t, tri, bound, drops = out
            # keep the stack warm so pops never run dry
            sp = jnp.maximum(sp, 64)
            return k + 1, sp, best_t, tri, bound, drops

        def fill(i, _):
            stack_ref[i] = ((i * 13) % 512) | ((i & 1) << 10)
            tstack_ref[i] = -1e30
            return 0
        jax.lax.fori_loop(0, STACK, fill, 0)
        init = (jnp.int32(0), jnp.int32(128),
                jnp.full(shape, 1e9, jnp.float32),
                jnp.zeros(shape, jnp.int32), jnp.float32(1e9),
                jnp.int32(0))
        if mode == "depcond":
            # the REAL kernel's loop condition: data-dependent scalars
            # (stack emptiness + prune bound) instead of a pure induction
            # variable — suspected to defeat Mosaic's loop pipelining
            out = jax.lax.while_loop(
                lambda s: (s[0] < steps) & (s[1] > 0) & (s[4] > -1e30),
                body, init)
        else:
            out = jax.lax.while_loop(lambda s: s[0] < steps, body, init)
        out_ref[...] = out[2] + out[3].astype(jnp.float32) \
            + out[4] + out[5].astype(jnp.float32)

    return kernel


def run(mode, rows, steps=400, reps=10, grid_tiles=1, big_tables=False):
    shape = (rows, 128)
    import numpy as np
    rng = np.random.default_rng(0)
    nrows = 4608 if big_tables else 512
    trows = 4608 if big_tables else 128
    ntab = jnp.asarray(rng.uniform(-1, 1, (nrows, 128)), jnp.float32)
    ttab = jnp.asarray(rng.uniform(-1, 1, (trows, 128)), jnp.float32)
    planes = [jnp.asarray(rng.uniform(-1, 1, (grid_tiles,) + shape),
                          jnp.float32) for _ in range(6)]
    inner = make_kernel(mode, rows, steps)

    if grid_tiles == 1 and not big_tables:
        fn = jax.jit(lambda n, t, *p: pl.pallas_call(
            lambda *a: inner(*a),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                            pltpu.SMEM((STACK,), jnp.float32)])(
                n, t, *[pp[0] for pp in p]))
    else:
        # the REAL kernel's context: a tile grid with pipelined ray
        # blocks + ANY-space tables staged into VMEM scratch at step 0
        def kern(n_ref, t_ref, *args):
            refs = args[:6]
            out_ref = args[6]
            stack_ref, tstack_ref, n_v, t_v, sem = args[7:]

            @pl.when(pl.program_id(0) == 0)
            def _copy():
                pltpu.make_async_copy(n_ref, n_v, sem.at[0]).start()
                pltpu.make_async_copy(t_ref, t_v, sem.at[1]).start()
                pltpu.make_async_copy(n_ref, n_v, sem.at[0]).wait()
                pltpu.make_async_copy(t_ref, t_v, sem.at[1]).wait()

            sq = [r[0] for r in refs]
            inner(n_v, t_v, *sq, out_ref.at[0], stack_ref, tstack_ref)

        ray_spec = pl.BlockSpec((1,) + shape, lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1,) + shape, lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        fn = jax.jit(lambda n, t, *p: pl.pallas_call(
            kern,
            grid=(grid_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
            + [ray_spec] * 6,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((grid_tiles,) + shape,
                                           jnp.float32),
            scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                            pltpu.SMEM((STACK,), jnp.float32),
                            pltpu.VMEM((nrows, 128), jnp.float32),
                            pltpu.VMEM((trows, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))])(n, t, *p),
            compiler_options={
                "xla_tpu_scoped_vmem_limit_kib": "114688"})

    def out_kern(o_ref, out_ref):
        pass

    r = fn(ntab, ttab, *planes)
    r.block_until_ready()
    from rtrt_tpu.utils.timing import fetch_rtt, force_ready
    rtt = fetch_rtt(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(ntab, ttab, *planes)
    force_ready(r)
    total_steps = steps * grid_tiles
    return (time.perf_counter() - t0 - rtt) / reps / total_steps * 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32)
    args = ap.parse_args()
    print(f"  1-tile, small tables: {run('both', args.rows):8.1f} ns/step",
          flush=True)
    print(f"  8-tile grid + staged 2.4MB tables: "
          f"{run('both', args.rows, steps=200, grid_tiles=8, big_tables=True):8.1f} ns/step",
          flush=True)


if __name__ == "__main__":
    main()
