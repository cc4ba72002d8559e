"""Bloom: bright-pass + gaussian pyramid blur + smoothed composite.

Counterpart of the reference's bloom (reference: BloomGuassian at
src/postprocessing.cuh:348-390 on the 1/4 and 1/16 buffers, composite
`Bloom` :392-410 adding 0.05 * (bicubic(1/4) + bicubic(1/16))).

TPU note: the reference's bicubic upscale is 16 gather taps per level;
bloom is low-frequency by construction, so a REPEAT upsample (pure layout
op, zero gathers) followed by a fused gaussian smooth is visually
equivalent and ~10x cheaper here.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.color import luminance
from ..ops.resize import downsample4
from ..ops.stencil import gaussian_weights, neighborhood


def _gauss5(img):
    w = gaussian_weights(2)
    taps, _ = neighborhood(img, 2)
    return jnp.sum(taps * w[:, None, None, None], axis=0)


def bright_pass(img, threshold):
    lum = luminance(img)[..., None]
    scale = jnp.clip((lum - threshold) / jnp.maximum(threshold, 1e-4), 0.0, 1.0)
    return img * scale


def _upsample_repeat(img, h, w, factor):
    """Nearest x-factor upsample via jnp.repeat + edge pad to (h, w)."""
    up = jnp.repeat(jnp.repeat(img, factor, axis=0), factor, axis=1)
    ph, pw = h - up.shape[0], w - up.shape[1]
    if ph < 0 or pw < 0:
        up = up[:h, :w]
        ph, pw = max(h - up.shape[0], 0), max(w - up.shape[1], 0)
    if ph or pw:
        up = jnp.pad(up, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return up


def bloom(img, bright_lum, strength):
    """img: (H,W,3) pre-tonemap linear color; bright_lum: adaptation bright
    luminance (threshold source, reference reads exposure[2]); strength:
    composite weight (reference 0.05)."""
    quarter = downsample4(img)
    sixteenth = downsample4(quarter)
    q = _gauss5(bright_pass(quarter, bright_lum))
    s = _gauss5(bright_pass(sixteenth, bright_lum))
    h, w = img.shape[0], img.shape[1]
    q_up = _gauss5(_upsample_repeat(q, h, w, 4))
    s_up = _gauss5(_gauss5(_upsample_repeat(s, h, w, 16)))
    return img + strength * (q_up + s_up)
