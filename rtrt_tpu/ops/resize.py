"""Resolution pyramid ops: box downsample and Catmull-Rom upscale.

Counterpart of the reference's DownScale4 pyramid (reference:
src/postprocessing.cuh:142, launches src/postprocessing.cu:21-35), the
BicubicScale render->screen upscale (:785+), and mip generation
(src/mipgen.cu:121-182).  Pure reshape-reduce / gather math that XLA maps
straight onto the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from .stencil import bicubic_catmull_rom_sample


def downsample2(img):
    """2x2 box average; (H,W,C)->(H/2,W/2,C) (truncates odd edges)."""
    h, w = img.shape[0] & ~1, img.shape[1] & ~1
    x = img[:h, :w]
    return x.reshape(h // 2, 2, w // 2, 2, -1).mean(axis=(1, 3)) \
        if img.ndim == 3 else x.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def downsample4(img):
    """4x4 box average — the reference's DownScale4 unit."""
    return downsample2(downsample2(img))


def upscale_catmull_rom(img, out_h: int, out_w: int):
    """Catmull-Rom bicubic resample to (out_h, out_w) — the reference's
    render-res -> screen-res BicubicScale."""
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    uv = jnp.stack([xx, yy], axis=-1)
    return bicubic_catmull_rom_sample(img, uv)
