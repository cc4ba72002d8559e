"""Compact texel/attribute packing codecs.

TPU-native counterpart of the reference's storage-format layer
(reference: src/fp16Utils.cuh half3/half4 converters :74-117, the packed
half3+ushort material-mask texel Store2DHalf3Ushort1 at src/sampler.cuh:115,
and the R11G10B11 normal codec at src/sampler.cuh:596-609).

On TPU the natural compact float is bfloat16 (native VPU dtype), so the
half-precision buffer formats become bf16 arrays; the bit-packing codecs
(normal octahedral/R11G10B11, color+mask fusion into one uint32 plane) are
pure bit math usable inside any jitted pass to halve history-buffer
bandwidth.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_bf16(x):
    """Storage downcast (the half-precision buffer format analog)."""
    return x.astype(jnp.bfloat16)


def from_bf16(x):
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# R11G10B11 packed color/normal (one uint32 per texel)
# ---------------------------------------------------------------------------


def pack_r11g10b11(v):
    """(...,3) floats in [0,1] -> (...,) uint32 (11/10/11 bits)."""
    v = jnp.clip(v, 0.0, 1.0)
    r = (v[..., 0] * 2047.0 + 0.5).astype(jnp.uint32)
    g = (v[..., 1] * 1023.0 + 0.5).astype(jnp.uint32)
    b = (v[..., 2] * 2047.0 + 0.5).astype(jnp.uint32)
    return (r << 21) | (g << 11) | b


def unpack_r11g10b11(p):
    p = p.astype(jnp.uint32)
    r = ((p >> 21) & 0x7FF).astype(jnp.float32) / 2047.0
    g = ((p >> 11) & 0x3FF).astype(jnp.float32) / 1023.0
    b = (p & 0x7FF).astype(jnp.float32) / 2047.0
    return jnp.stack([r, g, b], axis=-1)


def encode_normal_r11g10b11(n):
    """Unit normal (...,3) -> uint32 via [0,1] remap (the reference's normal
    buffer codec, sampler.cuh:596-609)."""
    return pack_r11g10b11(n * 0.5 + 0.5)


def decode_normal_r11g10b11(p):
    v = unpack_r11g10b11(p) * 2.0 - 1.0
    norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-12))
    return v / norm


# ---------------------------------------------------------------------------
# octahedral unit-vector codec (2x16 bits — tighter than R11G10B11)
# ---------------------------------------------------------------------------


def encode_normal_oct16(n):
    """Unit (...,3) -> (...,) uint32 (16+16 bit octahedral)."""
    ax = jnp.abs(n)
    denom = jnp.maximum(ax[..., 0] + ax[..., 1] + ax[..., 2], 1e-12)
    x = n[..., 0] / denom
    y = n[..., 1] / denom
    # fold the lower hemisphere
    xf = jnp.where(n[..., 2] < 0.0,
                   (1.0 - jnp.abs(y)) * jnp.sign(x + 1e-20), x)
    yf = jnp.where(n[..., 2] < 0.0,
                   (1.0 - jnp.abs(x)) * jnp.sign(y + 1e-20), y)
    qx = jnp.clip((xf * 0.5 + 0.5) * 65535.0 + 0.5, 0, 65535).astype(jnp.uint32)
    qy = jnp.clip((yf * 0.5 + 0.5) * 65535.0 + 0.5, 0, 65535).astype(jnp.uint32)
    return (qx << 16) | qy


def decode_normal_oct16(p):
    p = p.astype(jnp.uint32)
    x = ((p >> 16).astype(jnp.float32) / 65535.0) * 2.0 - 1.0
    y = ((p & 0xFFFF).astype(jnp.float32) / 65535.0) * 2.0 - 1.0
    z = 1.0 - jnp.abs(x) - jnp.abs(y)
    t = jnp.maximum(-z, 0.0)
    x = x - jnp.sign(x + 1e-20) * t
    y = y - jnp.sign(y + 1e-20) * t
    v = jnp.stack([x, y, z], axis=-1)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-12))
    return v / norm


# ---------------------------------------------------------------------------
# color + material-mask fused texel (the Half3Ushort1 analog):
# bf16 color triple + uint16 mask packed into two uint32 planes
# ---------------------------------------------------------------------------


def pack_color_mask(color, mask_u16):
    """(...,3) f32 color + (...,) int mask -> ((...,) uint32, (...,) uint32).

    Plane A: bf16(r) | bf16(g) << 16;  Plane B: bf16(b) | mask << 16."""
    cb = color.astype(jnp.bfloat16)
    r = cb[..., 0].view(jnp.uint16).astype(jnp.uint32)
    g = cb[..., 1].view(jnp.uint16).astype(jnp.uint32)
    b = cb[..., 2].view(jnp.uint16).astype(jnp.uint32)
    m = (mask_u16.astype(jnp.uint32) & 0xFFFF)
    return r | (g << 16), b | (m << 16)


def unpack_color_mask(plane_a, plane_b):
    r = (plane_a & 0xFFFF).astype(jnp.uint16).view(jnp.bfloat16)
    g = (plane_a >> 16).astype(jnp.uint16).view(jnp.bfloat16)
    b = (plane_b & 0xFFFF).astype(jnp.uint16).view(jnp.bfloat16)
    m = (plane_b >> 16).astype(jnp.int32)
    color = jnp.stack([r, g, b], axis=-1).astype(jnp.float32)
    return color, m
