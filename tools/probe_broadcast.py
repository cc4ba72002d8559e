"""Hardware probe: per-record attribute-consumption strategies.

The resolve loop / non-lean leaf path consume ~13 values per record via
scalar lane extracts (`row[0, k]`), each a vector->scalar sync.  Candidate
replacement: store the table TRANSPOSED (record i = 16 sublanes at lane
i%128 of sublane-block i//128), fetch with one dynamic sublane slice + one
lane roll, and broadcast `block[:, :1]` (16,1)->(16,128) in the LANE axis
only (single-axis broadcasts are implemented in Mosaic; it is the
both-axes (1,1)->(S,L) broadcast that is not).

Modes:
  extract   fetch (1,128) row + 13 lane extracts -> 13 masked selects
  bcast16   fetch (16,128) block + lane roll + (16,1) lane broadcast
            -> 13 masked selects from static sublane slices
Each iteration's selects feed carried (64,128) planes (no DCE), and the
loop count is printed at two step counts to check timing linearity.

Usage: python tools/probe_broadcast.py [--steps 2000]
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

SHAPE = (64, 128)
NVAL = 13


def make_kernel(mode, steps):
    def kernel(tab_ref, ttab_ref, pend_ref, out_ref):
        pend = pend_ref[...]

        def extract_vals(i):
            row = tab_ref[pl.ds(i // 8, 1), :]
            sh = 16 * (i % 8)
            row = pltpu.roll(row, jnp.where(sh == 0, 0, 128 - sh), 1)
            return [row[0, v] for v in range(NVAL)]

        def bcast_vals(i):
            blk = ttab_ref[pl.ds((i // 128) * 16, 16), :]
            blk = pltpu.roll(blk, (128 - i % 128) % 128, 1)
            col = blk[:, :1]                      # (16,1)
            wide = col + jnp.zeros((16, 128), jnp.float32)  # lane bcast
            return [wide[v:v + 1, :] for v in range(NVAL)]  # (1,128) rows

        def body(s):
            # exact resolve_one structure: min-extract a winner (scalar
            # sync), fetch/broadcast its record, masked-select into the
            # carried planes, remove it from pend — every iteration
            # depends on the previous (no hoisting, like the real loop)
            k, pend = s[0], s[1]
            acc = s[2:]
            cand = jnp.min(pend)                  # scalar sync
            vals = extract_vals(cand & 1023) if mode == "extract" \
                else bcast_vals(cand & 1023)
            m = pend == cand
            acc = tuple(jnp.where(m, acc[v] + vals[v], acc[v])
                        for v in range(NVAL))
            pend = jnp.where(m, jnp.int32(2**30), pend)
            return (k + 1, pend) + acc

        init = (jnp.int32(0), pend) + tuple(
            jnp.zeros(SHAPE, jnp.float32) for _ in range(NVAL))
        out = jax.lax.while_loop(lambda s: s[0] < steps, body, init)
        out_ref[...] = functools.reduce(jnp.add, out[2:]) \
            + out[1].astype(jnp.float32)

    return kernel


def run(mode, steps, reps=10):
    tab = (jnp.arange(128 * 128, dtype=jnp.float32) % 7.0).reshape(128, 128)
    # transposed layout: 1024 records = 8 sublane-blocks of 16 rows
    ttab = (jnp.arange(16 * 8 * 128, dtype=jnp.float32) % 7.0
            ).reshape(16 * 8, 128)
    pend = (jnp.arange(SHAPE[0] * SHAPE[1], dtype=jnp.int32) % 1024
            ).reshape(SHAPE)
    kern = make_kernel(mode, steps)
    fn = jax.jit(lambda a, b, c: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32))(a, b, c))
    r = fn(tab, ttab, pend)
    r.block_until_ready()
    from rtrt_tpu.utils.timing import fetch_rtt, force_ready
    rtt = fetch_rtt(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(tab, ttab, pend)
    force_ready(r)
    dt = (time.perf_counter() - t0 - rtt) / reps
    return dt / steps * 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()
    for mode in ("extract", "bcast16"):
        n1 = run(mode, args.steps)
        n2 = run(mode, args.steps * 2)
        print(f"{mode:<8} {n1:8.1f} ns/iter  (x2 steps: {n2:8.1f} — "
              f"linear={abs(n2 - n1) < 0.3 * max(n1, 1)})")


if __name__ == "__main__":
    main()
