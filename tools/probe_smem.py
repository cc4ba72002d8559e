"""Probe: SMEM scratch capacity + scalar-load-and-splat throughput.

The r4 surgical A/Bs put a leaf visit at ~2.5 us, dominated by ~72
vector->scalar lane extracts (~30 ns each — a cross-unit transfer per
value).  If triangle data lived in SMEM, each value would be a SCALAR
LOAD + scalar->vector splat — no vector-unit round trip.  This probe
answers (a) how big an SMEM scratch Mosaic accepts, (b) what a
load+splat+use iteration costs vs the extract pattern.

Usage: python tools/probe_smem.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (64, 128)


def try_alloc(n_floats):
    def kernel(x_ref, out_ref, smem):
        smem[0] = x_ref[0, 0]
        smem[n_floats - 1] = x_ref[0, 1]
        out_ref[...] = x_ref[...] + smem[0] + smem[n_floats - 1]

    try:
        fn = jax.jit(lambda a: pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            scratch_shapes=[pltpu.SMEM((n_floats,), jnp.float32)])(a))
        r = fn(jnp.ones(SHAPE))
        r.block_until_ready()
        return True
    except Exception as e:
        return False


def time_consume(mode, steps=400, reps=10, nvals=9, nrec=8):
    """One 'leaf visit' per iteration: consume nrec records x nvals values
    via (a) lane extracts from a fetched row, or (b) SMEM scalar loads.
    The consumed values feed dense plane math into carried state (no DCE);
    the record index advances data-dependently (no hoisting)."""
    def kernel(tab_ref, x_ref, out_ref, smem, sem):
        # stage the table into SMEM once (HBM->SMEM DMA)
        if mode == "smem":
            pltpu.make_async_copy(tab_ref, smem, sem).start()
            pltpu.make_async_copy(tab_ref, smem, sem).wait()
        x = x_ref[...]

        def body(s):
            k, acc = s
            base = (k * 7) % 997

            vals = []
            if mode == "extract":
                row = tab_ref[pl.ds(base // 8, 1), :]
                for r in range(nrec):
                    for v in range(nvals):
                        vals.append(row[0, 16 * r + v])
            else:
                for r in range(nrec):
                    for v in range(nvals):
                        vals.append(smem[(base + 16 * r + v) % 8000])
            a = acc
            for i in range(0, len(vals), 3):
                a = jnp.minimum(a * vals[i] + vals[i + 1], vals[i + 2] + a)
            # data-dependent next index: no hoisting
            return k + 1 + (a[0, 0] > 1e30).astype(jnp.int32), a

        out = jax.lax.while_loop(lambda s: s[0] < steps, body,
                                 (jnp.int32(0), x))
        out_ref[...] = out[1]

    tab = (jnp.arange(128 * 128, dtype=jnp.float32) % 3.0
           ).reshape(128, 128) * 1e-3 + 0.5
    fn = jax.jit(lambda t, a: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        scratch_shapes=[pltpu.SMEM((16384,), jnp.float32),
                        pltpu.SemaphoreType.DMA])(t, a))
    x = jnp.full(SHAPE, 0.5)
    r = fn(tab, x)
    r.block_until_ready()
    from rtrt_tpu.utils.timing import fetch_rtt, force_ready
    rtt = fetch_rtt(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(tab, x)
    force_ready(r)
    return (time.perf_counter() - t0 - rtt) / reps / steps * 1e9


def main():
    for mb in (0.25, 0.5, 1.0, 2.0, 4.0):
        n = int(mb * 2**20 / 4)
        print(f"SMEM scratch {mb:4.2f} MiB: "
              f"{'OK' if try_alloc(n) else 'REJECTED'}", flush=True)
    for mode in ("extract", "smem"):
        ns = time_consume(mode)
        print(f"{mode:>8}: {ns:8.1f} ns per 72-value visit", flush=True)


if __name__ == "__main__":
    main()
