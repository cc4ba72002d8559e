"""Fused post-processing tail as ONE Pallas kernel: exposure + tone map +
sharpen + blue-noise dither + quantize.

Counterpart of the reference's tone-mapping kernels + SharpeningFilter +
CopyToOutput (reference: src/postprocessing.cuh:493-783, src/kernel.cu:26-59
— three separate kernel launches there).  In XLA form these are ~5 full-res
elementwise/3x3 passes whose tap shifts cross vreg tiles (measured ~12 ms
at 1080p); the fused windowed kernel reads each pixel once (halo 1) and
writes the quantized value once (~1 ms).

Math is IDENTICAL to the XLA twins in post/tonemap.py / post/sharpen.py /
post/pipeline.py — tests cross-check interpret mode against them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T_H = 64      # output tile rows
_T_W = 512     # output tile cols

# ACES fitted (Stephen Hill) matrices as python constants (component form)
_ACES_IN = ((0.59719, 0.35458, 0.04823),
            (0.07600, 0.90834, 0.01566),
            (0.02840, 0.13383, 0.83777))
_ACES_OUT = ((1.60475, -0.53108, -0.07367),
             (-0.10208, 1.10813, -0.00605),
             (-0.00327, -0.07276, 1.07602))

_LUM = (0.2126, 0.7152, 0.0722)


def _tonemap3(cx, cy, cz, tone_idx, inv_gamma):
    """Branchless 4-way tone map + gamma on component planes (twin of
    post/tonemap.py::tonemap)."""
    # Reinhard extended (white = 4)
    lum = _LUM[0] * cx + _LUM[1] * cy + _LUM[2] * cz
    num = lum * (1.0 + lum / 16.0)
    mapped = num / (1.0 + lum)
    rs = mapped / jnp.maximum(lum, 1e-6)
    t0 = [jnp.clip(c * rs, 0.0, 1.0) for c in (cx, cy, cz)]

    # ACES fitted
    v = [m[0] * cx + m[1] * cy + m[2] * cz for m in _ACES_IN]
    v = [(x * (x + 0.0245786) - 0.000090537)
         / (x * (0.983729 * x + 0.4329510) + 0.238081) for x in v]
    t1 = [jnp.clip(m[0] * v[0] + m[1] * v[1] + m[2] * v[2], 0.0, 1.0)
          for m in _ACES_OUT]

    # ACES approx (Narkowicz)
    def _apx(c):
        c = c * 0.6
        return jnp.clip((c * (2.51 * c + 0.03))
                        / (c * (2.43 * c + 0.59) + 0.14), 0.0, 1.0)
    t2 = [_apx(c) for c in (cx, cy, cz)]

    # Uncharted2 (Hable, white = 11.2)
    def _hable(x):
        a, b, c_, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
        return ((x * (a * x + c_ * b) + d * e)
                / (x * (a * x + b) + d * f)) - e / f
    hw = _hable(jnp.float32(11.2))
    t3 = [jnp.clip(_hable(c * 2.0) / hw, 0.0, 1.0) for c in (cx, cy, cz)]

    i = jnp.round(tone_idx)
    out = [jnp.where(i == 0, a, jnp.where(i == 1, b,
                                          jnp.where(i == 2, c, d)))
           for a, b, c, d in zip(t0, t1, t2, t3)]
    return [jnp.power(jnp.clip(o, 0.0, 1.0), inv_gamma) for o in out]


def _tail_kernel(par_ref, mask_ref, cx_h, cy_h, cz_h,
                 rx_o, ry_o, rz_o, *scratch,
                 wh: int, ww: int, do_sharpen: bool, do_dither: bool,
                 interpret: bool):
    scx, scy, scz = scratch[:3]
    sems = scratch[3]
    i = pl.program_id(0)
    j = pl.program_id(1)
    y0 = i * _T_H
    x0 = j * _T_W
    planes = [(cx_h, scx), (cy_h, scy), (cz_h, scz)]
    copies = [pltpu.make_async_copy(
        hbm.at[pl.ds(y0, wh), pl.ds(x0, ww)], dst, sems.at[k])
        for k, (hbm, dst) in enumerate(planes)]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    ev = par_ref[0]
    tone_idx = par_ref[1]
    inv_gamma = 1.0 / par_ref[2]
    amount = par_ref[3]
    fshift = par_ref[4]

    # tone map the whole window (halo included) so sharpen taps read LDR
    lx, ly, lz = _tonemap3(scx[...] * ev, scy[...] * ev, scz[...] * ev,
                           tone_idx, inv_gamma)

    def at(s, dy, dx):
        return s[1 + dy:1 + dy + _T_H, 1 + dx:1 + dx + _T_W]

    outs = []
    for p in (lx, ly, lz):
        c0 = at(p, 0, 0)
        if do_sharpen:
            acc = jnp.zeros((_T_H, _T_W), jnp.float32)
            nmin = jnp.full((_T_H, _T_W), jnp.inf, jnp.float32)
            nmax = jnp.full((_T_H, _T_W), -jnp.inf, jnp.float32)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    t = at(p, dy, dx)
                    acc = acc + t
                    nmin = jnp.minimum(nmin, t)
                    nmax = jnp.maximum(nmax, t)
            sharp = c0 + (c0 - acc * (1.0 / 9.0)) * (2.0 * amount)
            outs.append(jnp.clip(sharp, nmin, nmax))
        else:
            outs.append(c0)

    if do_dither:
        # dither mask pre-tiled host-side to exactly (_T_H, _T_W): the
        # 64-periodic mask and the 64/512-aligned tile origins make every
        # tile see the same tiling phase
        noise = (mask_ref[...] + fshift) % 1.0 - 0.5
        outs = [o + noise * (1.0 / 255.0) for o in outs]

    rx_o[...] = jnp.clip(outs[0] * 255.0 + 0.5, 0.0, 255.0)
    ry_o[...] = jnp.clip(outs[1] * 255.0 + 0.5, 0.0, 255.0)
    rz_o[...] = jnp.clip(outs[2] * 255.0 + 0.5, 0.0, 255.0)


def post_tail_pallas(color, ev, tone_idx, gamma, sharpen_amount, fshift,
                     mask, *, do_sharpen: bool, do_dither: bool,
                     interpret: bool = False):
    """color: (H,W,3) linear HDR (post bloom/flare).  Returns (H,W,3) u8.

    mask: (mh,mw) f32 blue-noise dither mask (render/sampling); mh must
    divide _T_H's multiples (64-periodic masks tile exactly).
    """
    import numpy as np

    h, w = color.shape[0], color.shape[1]
    mask = np.asarray(mask, np.float32)
    assert _T_H % mask.shape[0] == 0 and _T_W % mask.shape[1] == 0
    mask = np.tile(mask, (_T_H // mask.shape[0], _T_W // mask.shape[1]))
    nty = max(-(-h // _T_H), 1)
    ntx = max(-(-w // _T_W), 1)
    hp, wp = nty * _T_H, ntx * _T_W
    wh = -(-(_T_H + 2) // 8) * 8           # 72
    ww = -(-(_T_W + 2) // 128) * 128       # 640
    pad_b = (hp - h) + (wh - _T_H - 1)
    pad_r = (wp - w) + (ww - _T_W - 1)

    def pad_m(x):
        return jnp.pad(x, ((1, pad_b), (1, pad_r)), mode="edge")

    planes = [pad_m(color[..., k]) for k in range(3)]
    par = jnp.stack([jnp.asarray(ev, jnp.float32),
                     jnp.asarray(tone_idx, jnp.float32),
                     jnp.asarray(gamma, jnp.float32),
                     jnp.asarray(sharpen_amount, jnp.float32),
                     jnp.asarray(fshift, jnp.float32)])

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    mask_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((_T_H, _T_W), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((hp, wp), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_tail_kernel, wh=wh, ww=ww, do_sharpen=do_sharpen,
                          do_dither=do_dither, interpret=interpret),
        grid=(nty, ntx),
        in_specs=[smem, mask_spec] + [hbm] * 3,
        out_specs=[blk] * 3,
        out_shape=[f32] * 3,
        scratch_shapes=[pltpu.VMEM((wh, ww), jnp.float32)] * 3
        + [pltpu.SemaphoreType.DMA((3,))],
        interpret=interpret,
    )(par, jnp.asarray(mask, jnp.float32), *planes)
    u8 = jnp.stack([o[:h, :w] for o in outs], axis=-1).astype(jnp.uint8)
    return u8
