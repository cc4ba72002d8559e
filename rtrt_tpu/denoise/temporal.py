"""Temporal reprojection filter (SVGF-style history accumulation).

TPU-native counterpart of the reference's TemporalFilter
(reference: src/temporalDenoising.cuh:610-893) and TemporalFilter2
(:896-1110): motion-vector history fetch, YCoCg neighborhood clamp,
material-mask validity, anti-flicker blend modulation, and the per-8x8-tile
noise-level estimate (:33-102) used to gate the spatial filters.

Everything is full-image (H, W, C) math built on the shifted-stack stencils
(ops/stencil.py) — one fused XLA pass instead of LDS-tiled CUDA blocks.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.color import luminance, rgb_to_ycocg, ycocg_to_rgb
from ..ops.stencil import (bicubic_catmull_rom_sample, bilinear_sample,
                           neighborhood)
from ..utils.config import DenoiseParams


def _uv_grid(h, w):
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([xx, yy], axis=-1)  # (H,W,2)


def temporal_filter(color, normal, depth, mat_id, motion,
                    hist_color, hist_depth, hist_mat, hist_valid,
                    p: DenoiseParams, bicubic: bool = False):
    """First temporal accumulation pass.

    color/normal: (H,W,3); depth: (H,W); mat_id: (H,W) i32; motion: (H,W,2)
    uv offsets (prev - cur); hist_*: previous-frame buffers; hist_valid: ()
    bool scalar (False on the first frame).
    Returns filtered color (H,W,3).
    """
    h, w = color.shape[0], color.shape[1]
    uv = _uv_grid(h, w)
    prev_uv = uv + motion

    # --- history fetch (reference uses bicubic Catmull-Rom :800-812; on TPU
    # each gather tap costs ~1ms at this resolution, so bilinear's 4 taps
    # are the default and bicubic is opt-in) ---
    if bicubic:
        hist = bicubic_catmull_rom_sample(hist_color, prev_uv)
    else:
        hist = bilinear_sample(hist_color, prev_uv)

    # --- neighborhood min/max clamp in YCoCg (:702-817) ---
    taps, _ = neighborhood(rgb_to_ycocg(color), 1)  # (9,H,W,3)
    box_min = jnp.min(taps, axis=0)
    box_max = jnp.max(taps, axis=0)
    center = 0.5 * (box_min + box_max)
    extent = 0.5 * (box_max - box_min) * p.anti_flicker + 1e-4
    hist_y = rgb_to_ycocg(hist)
    clamped = jnp.clip(hist_y, center - extent, center + extent)
    hist = ycocg_to_rgb(clamped)

    # --- history validity (:836-851) ---
    in_bounds = ((prev_uv[..., 0] >= 0.0) & (prev_uv[..., 0] <= 1.0)
                 & (prev_uv[..., 1] >= 0.0) & (prev_uv[..., 1] <= 1.0))
    # material-mask agreement: nearest-texel history id
    hx = jnp.clip((prev_uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    hy = jnp.clip((prev_uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    mat_ok = hist_mat[hy, hx] == mat_id
    # depth agreement (relative)
    hd = hist_depth[hy, hx]
    both_fin = jnp.isfinite(depth) & jnp.isfinite(hd)
    depth_ok = jnp.where(
        both_fin,
        jnp.abs(hd - depth) <= p.sigma_depth * jnp.maximum(depth, 1.0) * 4.0 + 1e-3,
        ~jnp.isfinite(depth) & ~jnp.isfinite(hd))  # both sky is fine
    ok = in_bounds & mat_ok & depth_ok & hist_valid

    # --- luma-weighted blend (:853-887): darker pixels get more history ---
    blend = jnp.clip(p.temporal_blend
                     * (1.0 + luminance(color) * 0.5), 0.0, 1.0)
    blend = jnp.where(ok, blend, 1.0)[..., None]
    return color * blend + hist * (1.0 - blend)


def tile_noise_level(color, depth, tile: int = 8):
    """Per-tile luminance relative variance, scaled by the non-sky ratio
    (reference: CalculateTileNoiseLevel, temporalDenoising.cuh:33-91).
    Returns (H/tile, W/tile)."""
    h, w = color.shape[0], color.shape[1]
    lum = luminance(color)
    not_sky = jnp.isfinite(depth).astype(jnp.float32)
    th, tw = h // tile, w // tile
    lt = lum[:th * tile, :tw * tile].reshape(th, tile, tw, tile)
    st = not_sky[:th * tile, :tw * tile].reshape(th, tile, tw, tile)
    mean = lt.mean(axis=(1, 3))
    var = jnp.maximum((lt * lt).mean(axis=(1, 3)) - mean * mean, 0.0)
    ratio = st.mean(axis=(1, 3))
    return var / jnp.maximum(mean * mean, 1e-4) * ratio


def tile_noise_downsample(noise):
    """8x8 -> 16x16 tile noise (2x2 average)
    (reference: TileNoiseLevel8x8to16x16, :93-102)."""
    h, w = noise.shape
    return noise[:h - h % 2, :w - w % 2].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def noise_level_visualize(img, noise, threshold, tile: int = 8):
    """Debug overlay: tint tiles whose noise exceeds the threshold orange
    (reference: TileNoiseLevelVisualize, :104-140)."""
    h, w = img.shape[0], img.shape[1]
    up = jnp.repeat(jnp.repeat(noise, tile, axis=0), tile, axis=1)[:h, :w]
    pad_h, pad_w = h - up.shape[0], w - up.shape[1]
    if pad_h or pad_w:
        up = jnp.pad(up, ((0, pad_h), (0, pad_w)), mode="edge")
    mask = (up > threshold)[..., None]
    tint = jnp.array([1.0, 0.5, 0.1], jnp.float32)
    return jnp.where(mask, img * 0.5 + tint * 0.5, img)
