"""Edge-aware spatial filters: 7x7 gaussian + dilated (a-trous) 5x5 chain.

TPU-native counterpart of the reference's spatial denoisers
(reference: SpatialFilter7x7 at src/temporalDenoising.cuh:317-492 and
SpatialFilterGlobal5x5<stride> at :495+, launched with strides 3/6/12 from
src/denoising.cu:132-157).

Joint-bilateral weights per tap (reference :739-767):
    w = gauss(offset) * max(0, dot(n, n_tap))^sigma_normal
        * exp(-|z - z_tap|^2 / sigma_depth) * [mat == mat_tap penalty]

Structural re-design for TPU: the reference *skips* quiet tiles (branchy);
we compute the filter everywhere and LERP by the noise gate — shape-static,
branch-free, and the XLA fusion makes the always-on cost close to the
gated one (SURVEY.md §7 stage-4 note).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.stencil import gaussian_weights, neighborhood
from ..utils.config import DenoiseParams


def _edge_aware_pass(color, normal, depth, mat_id, p: DenoiseParams,
                     radius: int, stride: int, half_taps: bool = False,
                     parity: int = 0):
    """One joint-bilateral gaussian pass; returns filtered color."""
    g = gaussian_weights(radius)
    c_taps, offs = neighborhood(color, radius, stride)        # (K,H,W,3)
    n_taps, _ = neighborhood(normal, radius, stride)
    d_taps, _ = neighborhood(depth, radius, stride)
    m_taps, _ = neighborhood(mat_id, radius, stride)

    n_w = jnp.maximum(jnp.sum(n_taps * normal[None], axis=-1), 0.0)
    n_w = n_w ** p.sigma_normal

    safe_d = jnp.where(jnp.isfinite(depth), depth, 0.0)
    safe_dt = jnp.where(jnp.isfinite(d_taps), d_taps, 0.0)
    dz = (safe_dt - safe_d[None]) / (p.sigma_depth * jnp.maximum(safe_d[None], 1.0) + 1e-6)
    d_w = jnp.exp(-dz * dz)
    d_w = jnp.where(jnp.isfinite(d_taps) == jnp.isfinite(depth)[None], d_w, 0.0)

    m_w = jnp.where(m_taps == mat_id[None], 1.0,
                    jnp.maximum(1.0 - p.sigma_material, 0.0))

    w = g[:, None, None] * n_w * d_w * m_w  # (K,H,W)
    if half_taps:
        # frame-alternating half kernel (reference :431-440): drop every
        # other tap by checkerboard parity of the offset index
        k = offs.shape[0]
        keep = (jnp.arange(k) + parity) % 2 == 0
        keep = keep | (jnp.arange(k) == k // 2)  # always keep center
        w = w * keep[:, None, None]

    wsum = jnp.sum(w, axis=0)
    out = jnp.sum(c_taps * w[..., None], axis=0) / jnp.maximum(wsum, 1e-6)[..., None]
    # fall back to the center where weights vanish
    return jnp.where((wsum > 1e-6)[..., None], out, color)


def _upsample_tiles(noise, h, w, tile):
    """Nearest-upsample a tile map to (h, w), edge-padding the remainder
    rows/cols when the resolution is not a tile multiple."""
    up = jnp.repeat(jnp.repeat(noise, tile, axis=0), tile, axis=1)[:h, :w]
    pad_h, pad_w = h - up.shape[0], w - up.shape[1]
    if pad_h or pad_w:
        up = jnp.pad(up, ((0, pad_h), (0, pad_w)), mode="edge")
    return up


def _gate_by_noise(filtered, original, noise, threshold, tile: int):
    """Noise-level gating as a smooth lerp (branch-free static shape)."""
    h, w = original.shape[0], original.shape[1]
    up = _upsample_tiles(noise, h, w, tile)
    gate = jnp.clip(up / jnp.maximum(threshold, 1e-8), 0.0, 1.0)[..., None]
    return original + (filtered - original) * gate


def spatial_filter_7x7(color, normal, depth, mat_id, noise8, p: DenoiseParams,
                       frame_parity: int = 0):
    """The reference's SpatialFilter7x7: full 7x7 joint-bilateral, gated by
    the 8x8 tile noise level, alternating half-kernels per frame."""
    filtered = _edge_aware_pass(color, normal, depth, mat_id, p, radius=3,
                                stride=1, half_taps=True, parity=frame_parity)
    return _gate_by_noise(filtered, color, noise8, p.noise_threshold, 8)


def spatial_filter_wide(color, normal, depth, mat_id, noise16,
                        p: DenoiseParams, stride: int):
    """The reference's SpatialFilterGlobal5x5<stride> (a-trous dilation):
    5x5 taps at the given stride (3/6/12 -> effective 15/30/60 px),
    gated by the 16x16 noise level."""
    filtered = _edge_aware_pass(color, normal, depth, mat_id, p, radius=2,
                                stride=stride)
    return _gate_by_noise(filtered, color, noise16, p.noise_threshold_16, 16)
