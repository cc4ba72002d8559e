"""Bloom: bright-pass + gaussian pyramid blur + bicubic composite.

Counterpart of the reference's bloom (reference: BloomGuassian at
src/postprocessing.cuh:348-390 on the 1/4 and 1/16 buffers, composite
`Bloom` :392-410 adding 0.05 * (bicubic(1/4) + bicubic(1/16))).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.color import luminance
from ..ops.resize import downsample4, upscale_catmull_rom
from ..ops.stencil import gaussian_weights, neighborhood


def _gauss5(img):
    w = gaussian_weights(2)
    taps, _ = neighborhood(img, 2)
    return jnp.sum(taps * w[:, None, None, None], axis=0)


def bright_pass(img, threshold):
    lum = luminance(img)[..., None]
    scale = jnp.clip((lum - threshold) / jnp.maximum(threshold, 1e-4), 0.0, 1.0)
    return img * scale


def bloom(img, bright_lum, strength):
    """img: (H,W,3) pre-tonemap linear color; bright_lum: adaptation bright
    luminance (threshold source, reference reads exposure[2]); strength:
    composite weight (reference 0.05)."""
    quarter = downsample4(img)
    sixteenth = downsample4(quarter)
    q = _gauss5(bright_pass(quarter, bright_lum))
    s = _gauss5(bright_pass(sixteenth, bright_lum))
    h, w = img.shape[0], img.shape[1]
    return img + strength * (upscale_catmull_rom(q, h, w)
                             + upscale_catmull_rom(s, h, w))
