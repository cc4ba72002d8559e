"""Sharpening filter with soft-clamp, plus a 9-tap median (available pass).

Counterpart of the reference's SharpeningFilter
(reference: src/postprocessing.cuh:714-783) and MedianFilter (:205+).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.stencil import neighborhood


def sharpen(img, amount):
    """3x3 unsharp mask whose result is softly clamped to the local
    neighborhood min/max (halo suppression, as the reference)."""
    taps, offs = neighborhood(img, 1)
    center = img
    blur = jnp.mean(taps, axis=0)
    sharp = center + (center - blur) * (2.0 * amount)
    nmin = jnp.min(taps, axis=0)
    nmax = jnp.max(taps, axis=0)
    return jnp.clip(sharp, nmin, nmax)


def median3(img):
    """9-tap per-channel median (sorting network via jnp.sort over taps)."""
    taps, _ = neighborhood(img, 1)  # (9,H,W,C)
    return jnp.sort(taps, axis=0)[4]
