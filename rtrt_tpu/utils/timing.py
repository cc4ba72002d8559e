"""Trustworthy device timing on hosts where blocking is unreliable.

Round-4 forensics: on the axon dev tunnel `jax.Array.block_until_ready()`
can return WITHOUT waiting for the computation (a probe of ten chained
~8 s computations "blocked" in 0.3 ms), which silently turns any
dispatch-then-block timing loop into a dispatch-latency measurement
(BENCH_r04.json recorded 0.18 ms for a ~120 ms frame).  A VALUE FETCH
cannot be skipped: the host bytes must exist.  Every timing tool in this
repo (bench.py, tools/probe_*, tools/tune_tile.py, tools/fps_demo.py)
closes its timed region with `force_ready` on the last result instead of
a block.
"""

from __future__ import annotations

import time


def force_ready(x) -> float:
    """Force execution of `x`'s whole dependency chain by fetching one
    element to the host; returns it as float (a checksum the caller may
    ignore).  Accepts any jax array or nested pytree (first leaf wins)."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    a = leaves[0]
    flat = jnp.ravel(jnp.asarray(a))[:1].astype(jnp.float32)
    return float(flat[0])


def fetch_rtt(x) -> float:
    """Calibrate the host<->device round-trip of `force_ready` on an
    ALREADY-COMPUTED array (call force_ready(x) once first): the returned
    seconds are pure transfer/dispatch latency to subtract from chained
    timings."""
    force_ready(x)  # ensure ready + compile the fetch
    t0 = time.perf_counter()
    force_ready(x)
    return time.perf_counter() - t0


def time_chained(dispatch, reps: int, warmup: int = 2):
    """Time `reps` chained dispatches with a forced fetch at the end.

    dispatch: callable (prev_result_or_None) -> result; each call should
    consume the previous result (or internal state) so the device
    serializes them.  Returns (seconds_per_rep, checksum)."""
    r = None
    for _ in range(warmup):
        r = dispatch(r)
    rtt = fetch_rtt(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = dispatch(r)
    checksum = force_ready(r)
    dt = (time.perf_counter() - t0 - rtt) / reps
    return dt, checksum
