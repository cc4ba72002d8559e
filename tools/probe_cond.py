"""Probe: does a data-dependent lax.cond serialize scalar extracts?

The r4 surgical A/Bs measured a leaf visit (72 lane extracts + dense MT
math, inside TWO nested data-dependent lax.conds) at ~2.5 us, while the
very same 72-extract consume pattern in a cond-free loop (probe_smem)
costs 74 ns.  Hypothesis: inside a cond region whose predicate is
data-dependent, the scalar unit cannot run ahead, so every
vector->scalar extract pays its full cross-unit latency serially.

Modes:
  flat      the 72-extract consume, no cond         (the 74 ns baseline)
  cond      same body inside lax.cond(data-dependent predicate)
  cond2     two nested conds (the real kernel's prune + leaf/internal)

Usage: python tools/probe_cond.py
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


def make_kernel(mode, steps):
    def kernel(tab_ref, x_ref, out_ref):
        x = x_ref[...]

        def consume(k, acc):
            base = (k * 7) % 997
            row = tab_ref[pl.ds(base // 8, 1), :]
            vals = []
            for r in range(8):
                for v in range(9):
                    vals.append(row[0, 16 * r + v])
            a = acc
            for i in range(0, len(vals), 3):
                a = jnp.minimum(a * vals[i] + vals[i + 1], vals[i + 2] + a)
            return a

        def body(s):
            k, acc = s
            if mode == "flat":
                acc = consume(k, acc)
            elif mode == "cond":
                acc = jax.lax.cond((k & 1023) >= 0, lambda a: consume(k, a),
                                   lambda a: a, acc)
            else:  # cond2
                def inner(a):
                    return jax.lax.cond((k & 511) >= 0,
                                        lambda b: consume(k, b),
                                        lambda b: b, a)
                acc = jax.lax.cond((k & 1023) >= 0, inner,
                                   lambda a: a, acc)
            return k + 1 + (acc[0, 0] > 1e30).astype(jnp.int32), acc

        out = jax.lax.while_loop(lambda s: s[0] < steps, body,
                                 (jnp.int32(0), x))
        out_ref[...] = out[1]

    return kernel


def run(mode, steps=400, reps=10):
    tab = ((jnp.arange(128 * 128, dtype=jnp.float32) % 3.0)
           .reshape(128, 128)) * 1e-3 + 0.5
    x = jnp.full(SHAPE, 0.5)
    kern = make_kernel(mode, steps)
    fn = jax.jit(lambda t, a: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32))(t, a))
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
    for mode in ("flat", "cond", "cond2"):
        print(f"{mode:>6}: {run(mode):8.1f} ns per 72-extract visit",
              flush=True)


if __name__ == "__main__":
    main()
