"""Probe: vector-register pressure as the real kernel's hidden per-step
cost.

The traversal loop keeps ~14 live (rows,128) planes (ray invariants +
carried hit state) across every iteration; at 64 rows that is ~112 vregs
— far past the register file — so each iteration's body may be paying
spill/reload traffic that scales with the tile row count (the measured
v ~= 0.9 us/step row-scaled component).  This probe reruns the cheap
72-extract visit with N extra loop-invariant planes folded into the math,
at 64 and 8 rows.

Usage: python tools/probe_pressure.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(n_inv, rows, steps):
    shape = (rows, 128)

    def kernel(tab_ref, x_ref, out_ref):
        x = x_ref[...]
        inv = [x * (1.0 + 0.01 * i) for i in range(n_inv)]  # live planes

        def body(s):
            k, acc = s
            base = (k * 7) % 997
            row = tab_ref[pl.ds(base // 8, 1), :]
            vals = [row[0, 16 * r + v] for r in range(8) for v in range(9)]
            a = acc
            for i in range(0, len(vals), 3):
                j = (i // 3) % max(n_inv, 1)
                term = inv[j] if n_inv else 0.5
                a = jnp.minimum(a * vals[i] + vals[i + 1] * term,
                                vals[i + 2] + a)
            return k + 1 + (a[0, 0] > 1e30).astype(jnp.int32), a

        out = jax.lax.while_loop(lambda s: s[0] < steps, body,
                                 (jnp.int32(0), x))
        out_ref[...] = out[1] + sum(inv[:1]) if n_inv else out[1]

    return kernel


def run(n_inv, rows, steps=400, reps=10):
    shape = (rows, 128)
    tab = ((jnp.arange(128 * 128, dtype=jnp.float32) % 3.0)
           .reshape(128, 128)) * 1e-3 + 0.5
    x = jnp.full(shape, 0.5)
    kern = make_kernel(n_inv, rows, steps)
    fn = jax.jit(lambda t, a: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(t, a))
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
    for rows in (64, 8):
        for n_inv in (0, 6, 12, 20):
            print(f"rows={rows:2d} invariant_planes={n_inv:2d}: "
                  f"{run(n_inv, rows):8.1f} ns/visit", flush=True)


if __name__ == "__main__":
    main()
