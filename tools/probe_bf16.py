"""Probe: VPU throughput of bf16 vs f32 vector math on this chip.

Decides whether a bf16 conservative slab-test path in the packet kernel
(half the vector registers per plane) buys ~2x on the traversal's
row-scaled cost (ROADMAP r4: v ~= 0.9 us/step of the 1.31 us full-tile
step is dense slab work).

Eight INDEPENDENT serial chains of mul+add+min/max over (64,128) planes:
enough ILP to measure throughput (not latency), serial within each chain
so nothing hoists, all chains folded into the output so nothing DCEs.
Linearity across two step counts is printed as a sanity gate — the r3/r4
synthetic ubenches failed exactly that check.

Usage: python tools/probe_bf16.py
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
CHAINS = 8
OPS_PER_STEP = 6  # per chain: 2 mul, 2 add/sub, 1 min, 1 max


def make_kernel(dtype, steps):
    def kernel(x_ref, out_ref):
        x = x_ref[...].astype(dtype)
        one = jnp.asarray(1.0000001, dtype)
        half = jnp.asarray(0.5, dtype)
        cap = jnp.asarray(3.0, dtype)
        floor = jnp.asarray(-3.0, dtype)

        def body(s):
            k = s[0]
            ch = s[1:]
            # serial within a chain; chains independent
            ch = tuple(
                jnp.minimum(
                    jnp.maximum(c * one + half - c * half, floor), cap)
                for c in ch)
            return (k + 1,) + ch

        init = (jnp.int32(0),) + tuple(
            x + jnp.asarray(float(i), dtype) for i in range(CHAINS))
        out = jax.lax.while_loop(lambda s: s[0] < steps, body, init)
        acc = out[1]
        for c in out[2:]:
            acc = acc + c
        out_ref[...] = acc.astype(jnp.float32)

    return kernel


def run(dtype, steps, reps=30):
    x = jnp.linspace(0, 1, SHAPE[0] * SHAPE[1]).reshape(SHAPE)
    kern = make_kernel(dtype, steps)
    fn = jax.jit(lambda a: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32))(a))
    r = fn(x)
    r.block_until_ready()
    from rtrt_tpu.utils.timing import fetch_rtt, force_ready
    rtt = fetch_rtt(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(x)
    force_ready(r)
    return (time.perf_counter() - t0 - rtt) / reps / steps * 1e9


def main():
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        n1 = run(dtype, 4000)
        n2 = run(dtype, 8000)
        ops = CHAINS * OPS_PER_STEP
        print(f"{name:>5}: {n1:7.1f} ns/step ({ops} plane-ops) "
              f"-> {n1 / ops:6.2f} ns/plane-op  "
              f"(x2 steps {n2:7.1f}, linear={abs(n2 - n1) < 0.25 * n1})")


if __name__ == "__main__":
    main()
