"""Procedural star field for night skies.

Counterpart of the reference's dormant star feature
(reference: src/star.cuh:10-57 StableStarField — hash-noise stars stable
under camera motion).  Pure hash math on the direction lattice: directions
quantize onto a cube-face grid; each cell hosts at most one star with hashed
position/brightness/twinkle.  Zero tables, fully vectorized.
"""

from __future__ import annotations

import jax.numpy as jnp

from .sampling import hash_pcg

GRID = 96.0  # stars per cube-face axis


def _cell_hash(ix, iy, face, seed):
    h = hash_pcg(ix.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                 ^ iy.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
                 ^ (face.astype(jnp.uint32) + jnp.uint32(seed)) * jnp.uint32(0xC2B2AE35))
    return h


def star_field(d, intensity=1.0, seed=17):
    """Star radiance along unit dirs (...,3) -> (...,3)."""
    ax = jnp.abs(d)
    # dominant axis -> cube face (0..5)
    face = jnp.where((ax[..., 0] >= ax[..., 1]) & (ax[..., 0] >= ax[..., 2]),
                     jnp.where(d[..., 0] >= 0, 0, 1),
                     jnp.where(ax[..., 1] >= ax[..., 2],
                               jnp.where(d[..., 1] >= 0, 2, 3),
                               jnp.where(d[..., 2] >= 0, 4, 5)))
    major = jnp.max(ax, axis=-1)
    # face-local uv in [0,1)
    u = jnp.where(face < 2, d[..., 1],
                  jnp.where(face < 4, d[..., 0], d[..., 0])) / major
    v = jnp.where(face < 2, d[..., 2],
                  jnp.where(face < 4, d[..., 2], d[..., 1])) / major
    u = (u + 1.0) * 0.5 * GRID
    v = (v + 1.0) * 0.5 * GRID
    iu = jnp.floor(u).astype(jnp.int32)
    iv = jnp.floor(v).astype(jnp.int32)
    h = _cell_hash(iu, iv, face, seed)
    # star sub-position within the cell
    fx = ((h & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65535.0)
    fy = (((h >> 16) & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65535.0)
    du = u - iu.astype(jnp.float32) - fx
    dv = v - iv.astype(jnp.float32) - fy
    d2 = du * du + dv * dv
    h2 = hash_pcg(h ^ jnp.uint32(0xB5297A4D))
    mag = ((h2 & jnp.uint32(0xFF)).astype(jnp.float32) / 255.0)
    exists = mag > 0.72  # ~28% of cells host a star
    brightness = jnp.where(exists, (mag - 0.72) / 0.28, 0.0) ** 3
    core = jnp.exp(-d2 * 600.0)
    # slight color temperature variation
    warm = ((h2 >> 8) & jnp.uint32(0xFF)).astype(jnp.float32) / 255.0
    tint = jnp.stack([0.9 + 0.3 * warm,
                      jnp.full_like(warm, 0.95),
                      1.2 - 0.3 * warm], axis=-1)
    return (brightness * core * intensity)[..., None] * tint
