"""Inter-pixel blue-noise sample distribution
(reference: src/blueNoiseRandGen.h:75-156 scrambling/ranking tiles).

Round 1 shipped per-pixel Owen-Sobol that is WHITE between pixels; these
tests pin the round-2 mechanism (shared sequence + blue-noise CP rotation,
sampling.rand2_bn): per-pixel quality is preserved and the 1-spp error
image has suppressed low-frequency energy — the property that makes the
spatial denoiser's job easy.
"""

import jax.numpy as jnp
import numpy as np

from rtrt_tpu.render import kshade as K
from rtrt_tpu.render.sampling import (blue_noise_mask, blue_offsets_flat,
                                      rand2, rand2_bn)

S = 64  # one mask period


def _error_image(u):
    """1-spp estimate error of E[u]=0.5 per pixel, shaped (S,S)."""
    return np.asarray(u).reshape(S, S) - 0.5


def _low_high_energy(err):
    f = np.fft.fftshift(np.abs(np.fft.fft2(err)) ** 2)
    yy, xx = np.mgrid[-S // 2:S // 2, -S // 2:S // 2]
    rad = np.sqrt(yy ** 2 + xx ** 2)
    return f[(rad < 5) & (rad > 0)].mean(), f[rad > 20].mean()


def test_mask_is_valid_permutation():
    m = blue_noise_mask()
    assert m.shape == (64, 64, 2)
    for ch in range(2):
        ranks = np.unique((m[:, :, ch] * 4096).astype(int))
        assert len(ranks) == 4096  # toroidal rank permutation


def test_bn_error_is_blue_white_is_not():
    """The single-frame error image of the blue-noise sampler must have far
    less low-frequency energy than the white (hash-decorrelated) sampler —
    the VERDICT neighborhood-error metric."""
    bn = blue_offsets_flat(S, S, S * S)
    pix = jnp.arange(S * S, dtype=jnp.int32)
    ratios = {}
    for name in ("bn", "white"):
        lows, highs = [], []
        for frame in range(4):
            f = jnp.uint32(frame)
            u = (rand2_bn(bn, f, jnp.uint32(2))[..., 0] if name == "bn"
                 else rand2(pix, f, jnp.uint32(2))[..., 0])
            lo, hi = _low_high_energy(_error_image(u))
            lows.append(lo)
            highs.append(hi)
        ratios[name] = np.mean(lows) / np.mean(highs)
    # white noise: flat spectrum (ratio ~1); blue: strongly suppressed lows
    assert ratios["white"] > 0.3
    assert ratios["bn"] < 0.05 * ratios["white"], ratios


def test_bn_preserves_per_pixel_stratification():
    """Per pixel over frames the sequence is still low-discrepancy: the
    N-frame average converges ~like Sobol, much faster than white noise."""
    bn = blue_offsets_flat(8, 8, 64)
    n = 64
    acc = np.zeros(64)
    for frame in range(n):
        acc += np.asarray(rand2_bn(bn, jnp.uint32(frame), jnp.uint32(2))[..., 0])
    err = np.abs(acc / n - 0.5)
    # CP rotation keeps O(1/N) convergence (one split stratum → ≤ ~1/64);
    # white noise max error over 64 pixels would be ~2.5σ ≈ 0.09
    assert err.max() < 0.02


def test_component_twin_matches():
    bn = blue_offsets_flat(16, 16, 256)
    f = jnp.uint32(5)
    d = jnp.uint32(66)
    ref = rand2_bn(bn, f, d)
    u1, u2 = K.rand2_bn_c(bn[:, 0], bn[:, 1], f, d)
    np.testing.assert_allclose(np.asarray(ref[..., 0]), np.asarray(u1),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(ref[..., 1]), np.asarray(u2),
                               atol=1e-7)
