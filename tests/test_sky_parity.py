"""Sky-model parity gates (PARITY.md sky row).

Two claims are pinned here:

1. The ACTIVE fitted-daylight sky (render/sky.py::preetham_radiance,
   selected via GlobalSettings.sky_model="preetham") implements the
   published Preetham/Perez model exactly: it must match the independent
   numpy formula twin (render/skyref.py) to float tolerance, and its
   chromaticity structure must show the physically-documented signature
   (deep-blue zenith, near-white horizon, circumsolar brightening).
   This is the reference's active-sky model family
   (reference: src/sky.cuh:91-320 — Hosek-Wilkie 2012 is the successor
   fit of Preetham 1999), built from published formulas instead of the
   reference's shipped coefficient dataset (src/skyData.h).

2. The default PHYSICAL sky (Rayleigh-Mie single scattering) reproduces
   the published daylight angular distribution away from its documented
   divergences: the circumsolar gamma-profile correlates >= 0.97 with the
   Perez standard at mid elevations (measured 0.99x), and hemisphere
   log-luminance correlation stays >= 0.8 (measured 0.83-0.87; the
   residual is the known single-scatter horizon over-brightening,
   quantified in tools/sky_compare.py and documented in PARITY.md).
"""

import numpy as np
import pytest

import jax

from rtrt_tpu.render.sky import (atmosphere_radiance, bake_sky_maps,
                                 make_sky_params, preetham_radiance)
from rtrt_tpu.render.skyref import sky_luminance, sky_rgb, sky_xyY

LUMA = np.array([0.2126, 0.7152, 0.0722])


def _hemisphere(n):
    from tools.sky_compare import fibonacci_hemisphere
    return fibonacci_hemisphere(n).astype(np.float32)


def test_preetham_jnp_matches_published_formulas():
    params = make_sky_params(sun_elevation=0.6, sun_azimuth=0.3)
    dirs = _hemisphere(512)
    ours = np.asarray(jax.jit(preetham_radiance)(dirs, params))
    ref = sky_rgb(dirs, np.asarray(params.sun_dir), 2.5)
    # identical up to the single radiometric calibration constant
    lo = ours @ LUMA
    lr = ref @ LUMA
    ratio = lo / np.maximum(lr, 1e-9)
    assert ratio.std() / ratio.mean() < 1e-3
    # per-channel shape too (chromaticity carried through)
    for c in range(3):
        r = ours[:, c] / np.maximum(ref[:, c], 1e-9)
        assert np.corrcoef(ours[:, c], ref[:, c])[0, 1] > 0.999


def test_preetham_chromaticity_signature():
    sun = np.array([0.0, np.sin(0.7), np.cos(0.7)])
    x, y, yy = sky_xyY(np.array([[0.0, 1.0, 1e-3],
                                 [0.0, 0.06, 1.0],
                                 [0.0, 0.06, -1.0]]) /
                       np.linalg.norm([[0, 1, 1e-3], [0, .06, 1],
                                       [0, .06, -1]], axis=1, keepdims=True),
                       sun, 2.5)
    zen_x, hor_x = x[0], x[1]
    # zenith is deep blue (x ~ 0.24), horizon near-white (x ~ 0.33)
    assert 0.22 < zen_x < 0.27 and 0.30 < hor_x < 0.35
    # sun-side horizon brighter than anti-sun horizon
    assert yy[1] > 1.5 * yy[2]
    # horizon brighter than zenith (published gradation for clear skies)
    assert yy[1] > yy[0]


@pytest.mark.slow
def test_physical_sky_gamma_profile_matches_perez():
    """Circumsolar gradation: at 30-degree view elevation the luminance
    falloff with sun angle must track the Perez standard."""
    params = make_sky_params(sun_elevation=0.7, sun_azimuth=0.0)
    sun = np.asarray(params.sun_dir)
    elev = np.radians(30.0)
    az = np.radians(np.linspace(0, 180, 25))
    dirs = np.stack([np.cos(elev) * np.sin(az),
                     np.full_like(az, np.sin(elev)),
                     np.cos(elev) * np.cos(az)], -1).astype(np.float32)
    ours = np.asarray(jax.jit(atmosphere_radiance)(dirs, params)) @ LUMA
    ref = sky_luminance(dirs, sun, 2.5)
    assert np.corrcoef(ours, ref)[0, 1] > 0.97


@pytest.mark.slow
def test_physical_sky_hemisphere_correlates_with_perez():
    params = make_sky_params(sun_elevation=0.35)
    sun = np.asarray(params.sun_dir)
    dirs = _hemisphere(2000)
    ours = np.asarray(jax.jit(atmosphere_radiance)(dirs, params)) @ LUMA
    ref = sky_luminance(dirs, sun, 2.5)
    cosg = dirs @ sun / np.linalg.norm(sun)
    mask = (cosg < np.cos(np.radians(10))) & (dirs[:, 1] > 0.035)
    a = np.log(np.maximum(ours[mask] / ours[mask].mean(), 1e-6))
    b = np.log(np.maximum(ref[mask] / ref[mask].mean(), 1e-6))
    assert np.corrcoef(a, b)[0, 1] > 0.8


def test_bake_with_preetham_model():
    maps = jax.jit(lambda p: bake_sky_maps(p, sky_res=(16, 32),
                                           sun_res=(8, 8),
                                           model="preetham"))(
        make_sky_params(sun_elevation=0.5))
    m = np.asarray(maps.sky_map)
    assert np.isfinite(m).all() and (m >= 0).all() and m.max() > 0
    cdf = np.asarray(maps.sky_cdf)
    assert (np.diff(cdf) >= -1e-6).all() and cdf[-1] == pytest.approx(1.0,
                                                                     abs=1e-4)
    # blue zenith in the baked map too (upper rows of the equal-area map)
    top = m[-2:].mean(axis=(0, 1))
    assert top[2] > top[0]
