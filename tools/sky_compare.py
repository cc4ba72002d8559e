"""Sky-model parity evidence: Rayleigh-Mie physical sky vs the published
Perez/Preetham analytic daylight standard (PARITY.md sky row closure).

The reference engine ships the Hosek-Wilkie fitted sky
(reference: src/sky.cuh:91-320 + src/skyData.h); we render a first-
principles single-scatter atmosphere instead (render/sky.py) and must show
it reproduces the published daylight ANGULAR LUMINANCE DISTRIBUTION —
the quantity that drives env CDFs, MIS weights and sky shading.  This tool
compares both models' normalized luminance over the upper hemisphere
(excluding the 10-degree circumsolar core, where a single-scatter model
legitimately differs from fitted aureole terms) across sun elevations and
prints correlation + relative RMSE + structural ratios.

Usage: python tools/sky_compare.py [--turbidity 2.5] [--samples 4000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LUMA = (0.2126, 0.7152, 0.0722)


def fibonacci_hemisphere(n):
    import numpy as np
    i = np.arange(n) + 0.5
    y = i / n                       # cos(theta) in (0,1): upper hemisphere
    phi = i * 2.399963229728653     # golden angle
    r = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    return np.stack([r * np.cos(phi), y, r * np.sin(phi)], axis=-1)


def compare(sun_elevation, turbidity, n, verbose=True):
    import numpy as np

    from rtrt_tpu.render.sky import atmosphere_radiance, make_sky_params
    from rtrt_tpu.render.skyref import sky_luminance

    import jax

    params = make_sky_params(sun_elevation=sun_elevation)
    dirs = fibonacci_hemisphere(n).astype(np.float32)
    ours_rgb = np.asarray(jax.jit(atmosphere_radiance)(dirs, params))
    ours = ours_rgb @ np.asarray(LUMA)
    ref = sky_luminance(dirs, np.asarray(params.sun_dir), turbidity)

    # exclude the circumsolar core (fitted aureole vs single scatter) and
    # the horizon band below 2 deg (our model marches to the ground there)
    sun = np.asarray(params.sun_dir, np.float64)
    cosg = dirs @ (sun / np.linalg.norm(sun))
    mask = (cosg < np.cos(np.radians(10.0))) & (dirs[:, 1] > 0.035)
    a = ours[mask]
    b = ref[mask]
    a = a / a.mean()
    b = b / b.mean()
    corr = float(np.corrcoef(np.log(np.maximum(a, 1e-6)),
                             np.log(np.maximum(b, 1e-6)))[0, 1])
    rrmse = float(np.sqrt(np.mean((a - b) ** 2)) / b.mean())

    # structural ratios: horizon brightening + sun-side/anti-sun asymmetry
    def mean_where(x, m):
        return float(x[m].mean()) if m.any() else float("nan")

    horiz = (dirs[:, 1] > 0.035) & (dirs[:, 1] < 0.25) & mask
    zen = dirs[:, 1] > 0.9
    sun_side = mask & (cosg > 0.5)
    anti = mask & (cosg < -0.5)
    rh_a = mean_where(ours / ours[mask].mean(), horiz) / \
        mean_where(ours / ours[mask].mean(), zen)
    rh_b = mean_where(ref / ref[mask].mean(), horiz) / \
        mean_where(ref / ref[mask].mean(), zen)
    rs_a = float(ours[sun_side].mean() / ours[anti].mean())
    rs_b = float(ref[sun_side].mean() / ref[anti].mean())

    if verbose:
        print(f"sun_elev={sun_elevation:4.2f} turb={turbidity}: "
              f"log-corr={corr:.4f} relRMSE={rrmse:.3f}  "
              f"horizon/zenith ours={rh_a:.2f} perez={rh_b:.2f}  "
              f"sun/anti ours={rs_a:.2f} perez={rs_b:.2f}")
    return corr, rrmse, (rh_a, rh_b), (rs_a, rs_b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turbidity", type=float, default=2.5)
    ap.add_argument("--samples", type=int, default=4000)
    args = ap.parse_args()
    for elev in (0.15, 0.35, 0.7, 1.1):
        compare(elev, args.turbidity, args.samples)


if __name__ == "__main__":
    main()
