"""kshade component-form shading == stacked-array twins, on random inputs.

The megakernel (render/megakernel.py) re-expresses the integrator's shading
math over per-component arrays (render/kshade.py).  These tests pin the
equivalence function-by-function so any drift between the Pallas path and
the XLA wavefront path is caught at the unit level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtrt_tpu.core.vecmath import dot, normalize
from rtrt_tpu.render import bsdf as B
from rtrt_tpu.render import kshade as K
from rtrt_tpu.render import sampling as smp
from rtrt_tpu.render.integrator import _orient_normals, _sphere_lights_pdf
from rtrt_tpu.render.light import SphereLights, sample_sphere_light, sample_sun, sun_pdf_dir
from rtrt_tpu.render.megakernel import (_unpack_sun, pack_light_rows,
                                        pack_sun_params)
from rtrt_tpu.render.proctex import soil_shading
from rtrt_tpu.render.sky import bake_sky_maps, make_sky_params

N = 512


def v3(a):
    """(N,3) -> V3 of (N,) components."""
    return K.V3(a[:, 0], a[:, 1], a[:, 2])


def stack(v):
    return np.stack([np.asarray(v.x), np.asarray(v.y), np.asarray(v.z)], -1)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    n = rng.normal(size=(N, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    wo = rng.normal(size=(N, 3)).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    # orient wo into n's hemisphere (shading convention)
    flip = (np.sum(wo * n, -1, keepdims=True) < 0)
    wo = np.where(flip, -wo, wo)
    u = rng.uniform(0, 1, (N, 2)).astype(np.float32)
    return dict(rng=rng, n=jnp.asarray(n), wo=jnp.asarray(wo),
                u=jnp.asarray(u))


def test_rand2_matches(data):
    pix = jnp.arange(N, dtype=jnp.uint32)
    ref = smp.rand2(pix, jnp.uint32(7), jnp.uint32(4))
    x, y = K.rand2_c(pix, jnp.uint32(7), jnp.uint32(4))
    np.testing.assert_array_equal(np.asarray(ref[:, 0]), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(ref[:, 1]), np.asarray(y))


def test_warps_match(data):
    u = data["u"]
    dx, dy = K.concentric_disk_c(u[:, 0], u[:, 1])
    ref = smp.concentric_disk(u)
    np.testing.assert_allclose(np.asarray(ref),
                               np.stack([np.asarray(dx), np.asarray(dy)], -1),
                               atol=1e-6)
    ch = K.cosine_hemisphere_c(u[:, 0], u[:, 1])
    np.testing.assert_allclose(np.asarray(smp.cosine_hemisphere(u)),
                               stack(ch), atol=1e-6)
    cone = K.uniform_cone_c(u[:, 0], u[:, 1], 0.9)
    np.testing.assert_allclose(np.asarray(smp.uniform_cone(u, 0.9)),
                               stack(cone), atol=1e-6)


def test_orient_normals_match(data):
    rng = data["rng"]
    ns = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    ng = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    wo = data["wo"]
    r_ns, r_ng = _orient_normals(ns, ng, wo)
    c_ns, c_ng = K.orient_normals_c(v3(ns), v3(ng), v3(wo))
    np.testing.assert_allclose(np.asarray(r_ns), stack(c_ns), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_ng), stack(c_ng), atol=1e-6)


def test_sample_eval_bsdf_match(data):
    rng = data["rng"]
    n, wo, u = data["n"], data["wo"], data["u"]
    mtype = jnp.asarray(rng.integers(0, 4, N).astype(np.int32))
    albedo = jnp.asarray(rng.uniform(0.1, 1.0, (N, 3)).astype(np.float32))
    rough = jnp.asarray(rng.uniform(0.05, 1.0, N).astype(np.float32))
    ior = jnp.full((N,), 1.5, jnp.float32)
    f0 = jnp.full((N, 3), 0.04, jnp.float32)
    inside = jnp.asarray(rng.integers(0, 2, N).astype(bool))

    ref = B.sample_bsdf(mtype, albedo, rough, ior, f0, n, wo, inside, u)
    got = K.sample_bsdf_c(mtype, v3(albedo), rough, ior, v3(f0), v3(n),
                          v3(wo), inside, u[:, 0], u[:, 1])
    np.testing.assert_allclose(np.asarray(ref.wi), stack(got.wi), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.weight), stack(got.weight),
                               rtol=1e-5, atol=1e-5)
    # pdf rtol 5e-3: the GGX D denominator (1+(a²-1)cos²θ)² amplifies
    # single-ulp differences from the component-form op ordering ~100x on
    # spiky lanes; both paths are correct f32 estimators
    np.testing.assert_allclose(np.asarray(ref.pdf), np.asarray(got.pdf),
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.is_delta),
                                  np.asarray(got.is_delta))

    wi = ref.wi
    f_ref, p_ref = B.eval_bsdf(mtype, albedo, rough, f0, n, wo, wi)
    f_got, p_got = K.eval_bsdf_c(mtype, v3(albedo), rough, v3(f0), v3(n),
                                 v3(wo), v3(wi))
    np.testing.assert_allclose(np.asarray(f_ref), stack(f_got), rtol=5e-3,
                               atol=1e-5)  # GGX spike lanes, see pdf note
    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p_got),
                               rtol=5e-3, atol=1e-5)  # see pdf rtol note above


@pytest.fixture(scope="module")
def sky():
    return jax.jit(lambda p: bake_sky_maps(p, sky_res=(16, 32),
                                           sun_res=(4, 4)))(make_sky_params())


def test_sun_nee_matches(data, sky):
    u = data["u"]
    sun = _unpack_sun(lambda i: pack_sun_params(sky)[i])
    ls = sample_sun(sky, u)
    wi, rad, pdf = K.sample_sun_c(sun, u[:, 0], u[:, 1])
    np.testing.assert_allclose(np.asarray(ls.wi), stack(wi), atol=1e-6)
    # Limb darkening amplifies ulp noise unboundedly at the disk rim:
    # mu = sqrt(1 - sin²γ/sin²γ_max) with sin²γ_max ≈ 2e-5, so a 1-ulp
    # difference in cos γ shifts mu² by ~6e-3 — at mu→0 that is a ~0.08
    # jump in mu itself (sqrt amplification).  Split lanes by an f64
    # recomputation of mu²: interior lanes must match tightly; rim lanes
    # only within the limb-darkening sensitivity bound 0.6·sqrt(Δmu²).
    # A ~3-ulp cos γ difference shifts mu² by dm ≈ 2e-2 (sin²γ_max ≈ 2e-5
    # in the denominator), so the only honest per-lane bound is the
    # limb-darkening sensitivity itself: |Δrad| ≤ 0.6·Δmu·rad_full where
    # Δmu = sqrt(mu²+dm) − sqrt(mu²−dm).  A real formula bug violates this
    # by orders of magnitude; ulp noise cannot.
    from rtrt_tpu.render.sky import SUN_COS_THETA_MAX
    r_ref = np.asarray(ls.radiance)
    r_got = stack(rad)
    wi64 = stack(wi).astype(np.float64)
    sd64 = np.asarray(sky.sun_dir, np.float64)
    sin2 = 1.0 - (wi64 @ sd64) ** 2
    mu2 = 1.0 - sin2 / (1.0 - float(SUN_COS_THETA_MAX) ** 2)
    dm = 2e-2
    mu = np.sqrt(np.clip(mu2, 0.0, 1.0))
    dmu = (np.sqrt(np.clip(mu2 + dm, 0.0, 1.0))
           - np.sqrt(np.clip(mu2 - dm, 0.0, None)))
    limb = 1.0 - 0.6 * (1.0 - mu)
    rad_full = r_ref / np.maximum(limb, 0.4)[:, None]
    allowed = 0.6 * dmu[:, None] * rad_full + 1e-3
    assert np.all(np.abs(r_ref - r_got) <= allowed)
    np.testing.assert_allclose(np.asarray(ls.pdf), np.asarray(pdf), rtol=1e-5)

    d = data["wo"]
    np.testing.assert_allclose(np.asarray(sun_pdf_dir(sky, d)),
                               np.asarray(K.sun_pdf_dir_c(sun, v3(d))),
                               rtol=1e-5)


def test_soil_shading_matches(data):
    rng = data["rng"]
    pos = jnp.asarray(rng.uniform(-20, 20, (N, 3)).astype(np.float32))
    ns = data["n"]
    cone = jnp.asarray(rng.uniform(0, 0.1, N).astype(np.float32))
    alb_r, rough_r, n_r = soil_shading(pos, ns, cone)
    alb_c, rough_c, n_c = K.soil_shading_c(v3(pos), v3(ns), cone)
    np.testing.assert_allclose(np.asarray(alb_r), stack(alb_c), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rough_r), np.asarray(rough_c),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(n_r), stack(n_c), atol=1e-5)


@pytest.fixture(scope="module")
def lights():
    return SphereLights(
        center=jnp.asarray([[3.0, 4.0, 1.0], [-2.0, 5.0, -3.0]], jnp.float32),
        radius=jnp.asarray([0.5, 1.0], jnp.float32),
        emission=jnp.asarray([[8.0, 6.0, 4.0], [2.0, 3.0, 9.0]], jnp.float32))


def test_sphere_light_sampling_matches(data, lights):
    rng = data["rng"]
    u = data["u"]
    p = jnp.asarray(rng.uniform(-8, 8, (N, 3)).astype(np.float32))
    li = jnp.asarray(rng.integers(0, 2, N).astype(np.int32))
    rows = pack_light_rows(lights)
    read = lambda i: rows[i]
    ls = sample_sphere_light(lights, li, p, u)
    wi, em, pdf, dist = K.sample_sphere_light_c(read, 2, li, v3(p),
                                                u[:, 0], u[:, 1])
    np.testing.assert_allclose(np.asarray(ls.wi), stack(wi), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ls.radiance), stack(em), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ls.pdf), np.asarray(pdf), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ls.dist), np.asarray(dist),
                               rtol=1e-3, atol=1e-3)


def test_sphere_lights_pdf_matches(data, lights):
    rng = data["rng"]
    p = jnp.asarray(rng.uniform(-8, 8, (N, 3)).astype(np.float32))
    d = data["wo"]
    rows = pack_light_rows(lights)
    ref = _sphere_lights_pdf(lights, p, d, None)
    got = K.sphere_lights_pdf_c(lambda i: rows[i], 2, v3(p), v3(d))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-4,
                               atol=1e-7)


def test_material_select_matches(data):
    from rtrt_tpu.engine.scene import default_materials
    mats = default_materials()
    rows = K.pack_materials_rows(mats)
    m = int(mats.mtype.shape[0])
    ids = jnp.asarray(data["rng"].integers(0, m, N).astype(np.int32))
    r_mt, r_alb, r_rough, r_ior, r_f0, r_em, r_tex = B.material_lookup(mats, ids)
    c_mt, c_alb, c_rough, c_ior, c_f0, c_em, c_tex = K.material_select_c(
        lambda i: rows[i], m, ids)
    np.testing.assert_array_equal(np.asarray(r_mt), np.asarray(c_mt))
    np.testing.assert_allclose(np.asarray(r_alb), stack(c_alb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_rough), np.asarray(c_rough),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_ior), np.asarray(c_ior), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_f0), stack(c_f0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_em), stack(c_em), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(r_tex), np.asarray(c_tex))
