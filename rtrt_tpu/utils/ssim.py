"""SSIM metric for golden-image comparison (BASELINE.json's image metric)."""

from __future__ import annotations

import numpy as np


def _gaussian_kernel(size=11, sigma=1.5):
    ax = np.arange(size) - size // 2
    k = np.exp(-(ax ** 2) / (2.0 * sigma ** 2))
    k = np.outer(k, k)
    return (k / k.sum()).astype(np.float64)


def _filter2(img, k):
    """Valid-mode 2D convolution via FFT-free separable-ish direct sum."""
    kh, kw = k.shape
    h, w = img.shape
    out = np.zeros((h - kh + 1, w - kw + 1), np.float64)
    for dy in range(kh):
        for dx in range(kw):
            out += k[dy, dx] * img[dy:dy + out.shape[0], dx:dx + out.shape[1]]
    return out


def ssim(a, b, data_range=255.0) -> float:
    """Mean SSIM over channels (Wang et al. 2004 constants).

    `data_range` MUST match the image scale: 255 for uint8-range images,
    1.0 for [0,1]-normalized ones.  A mismatched range saturates c1/c2 and
    the metric degenerates (~0.996 for unrelated random [0,1] images with
    data_range=255) — guarded below because it silently voided a recorded
    quality bar once (ADVICE r3)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    peak = max(a.max(), b.max(), 1e-12)
    assert data_range <= 4.0 * peak, \
        (f"ssim data_range={data_range} but image peak={peak:.4g} — "
         f"normalized images need data_range=1.0")
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    k = _gaussian_kernel()
    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        mx = _filter2(x, k)
        my = _filter2(y, k)
        mxx = _filter2(x * x, k)
        myy = _filter2(y * y, k)
        mxy = _filter2(x * y, k)
        vx = mxx - mx * mx
        vy = myy - my * my
        cxy = mxy - mx * my
        s = ((2 * mx * my + c1) * (2 * cxy + c2)) / \
            ((mx * mx + my * my + c1) * (vx + vy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))
