"""Generate the toroidal blue-noise offset masks (void-and-cluster).

Offline analog of the reference's blue-noise data tables
(reference: src/blueNoiseRandGenData.h — Heitz-Belcour Sobol/scrambling/
ranking tiles; generator not shipped there either).  We generate our own
64x64 masks with Ulichney's void-and-cluster method and use them as
Cranley-Patterson rotation offsets (Georgiev-Fajardo blue-noise dithered
sampling), which distributes 1-spp Monte-Carlo error as blue noise between
pixels — the property the denoiser feeds on.

Writes resources/bluenoise64.npy: (64, 64, 2) float32 in [0,1), two
independently generated channels (one per sample-vector component).

Usage: python tools/bluenoise_gen.py
"""

import os
import sys

import numpy as np

SIZE = 64
SIGMA = 1.9  # Ulichney's recommended gaussian width


def _energy_kernel(size, sigma):
    """Toroidal gaussian energy splat, centered at (0,0)."""
    ax = np.arange(size)
    d = np.minimum(ax, size - ax).astype(np.float64)  # toroidal distance
    d2 = d[:, None] ** 2 + d[None, :] ** 2
    return np.exp(-d2 / (2.0 * sigma * sigma))


def void_and_cluster(size=SIZE, sigma=SIGMA, seed=0):
    """Returns (size,size) float32 rank mask in [0,1) (Ulichney 1993)."""
    rng = np.random.default_rng(seed)
    kern = _energy_kernel(size, sigma)
    n = size * size

    # initial binary pattern: 10% random points, relaxed so the tightest
    # cluster swaps into the biggest void until stable
    count = n // 10
    binary = np.zeros((size, size), bool)
    idx = rng.choice(n, count, replace=False)
    binary[np.unravel_index(idx, binary.shape)] = True

    def energy(b):
        f = np.fft.rfft2(b.astype(np.float64))
        return np.fft.irfft2(f * kf, s=b.shape)

    kf = np.fft.rfft2(np.fft.ifftshift(np.fft.fftshift(kern)))
    for _ in range(10 * n):
        e = energy(binary)
        cluster = np.unravel_index(np.argmax(np.where(binary, e, -np.inf)),
                                   binary.shape)
        binary[cluster] = False
        e = energy(binary)
        void = np.unravel_index(np.argmin(np.where(binary, np.inf, e)),
                                binary.shape)
        binary[void] = True
        if void == cluster:
            break

    rank = np.zeros((size, size), np.int32)
    # phase 1: remove tightest clusters down to empty, ranking backwards
    b = binary.copy()
    for r in range(count - 1, -1, -1):
        e = energy(b)
        p = np.unravel_index(np.argmax(np.where(b, e, -np.inf)), b.shape)
        b[p] = False
        rank[p] = r
    # phase 2: fill biggest voids up from the initial pattern
    b = binary.copy()
    for r in range(count, n):
        e = energy(b)
        p = np.unravel_index(np.argmin(np.where(b, np.inf, e)), b.shape)
        b[p] = True
        rank[p] = r

    return ((rank.astype(np.float64) + 0.5) / n).astype(np.float32)


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "resources", "bluenoise64.npy")
    masks = np.stack([void_and_cluster(seed=11), void_and_cluster(seed=23)],
                     axis=-1)
    np.save(out, masks)
    print(f"wrote {out} {masks.shape} {masks.dtype}")


if __name__ == "__main__":
    sys.exit(main())
