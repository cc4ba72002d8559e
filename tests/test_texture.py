"""Gather-based mip/triplanar texture pipeline (render/texture.py).

This is the CPU-wavefront texture path (the reference's mip-atlas
sampling, src/texture.h:14-25 + src/mipgen.cu:121-182 + triplanar LOD at
src/surfaceInteraction.cuh:75-164) and the ground truth the Fourier-fitted
kernel path (render/ftex.py) is fit against.  VERDICT r3 flagged it as
parity-claimed but untested — these are the gates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtrt_tpu.render.texture import (MipTexture, apply_normal_map,
                                     build_mip_pyramid, make_soil_textures,
                                     sample_trilinear, triplanar_sample)


@pytest.fixture(scope="module")
def checker():
    n = 64
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    img = (((xx // 8) + (yy // 8)) % 2).astype(np.float32)[..., None]
    return build_mip_pyramid(np.concatenate([img, 1.0 - img], axis=-1))


def test_mip_pyramid_structure(checker):
    # levels 64..1 -> 7 levels; every level preserves the mean (box filter)
    assert checker.num_levels == 7
    offs = np.asarray(checker.offsets)
    sizes = [64 >> l for l in range(7)]
    assert offs[0] == 0
    for l in range(1, 7):
        assert offs[l] == offs[l - 1] + sizes[l - 1] ** 2
    tex = np.asarray(checker.texels)
    means = [tex[offs[l]:offs[l] + sizes[l] ** 2, 0].mean()
             for l in range(7)]
    np.testing.assert_allclose(means, means[0], atol=1e-6)
    # the 1x1 tail IS the mean
    np.testing.assert_allclose(tex[offs[-1], 0], 0.5, atol=1e-6)


def test_trilinear_lod_limits(checker):
    uv = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (256, 2)),
                     jnp.float32)
    # lod 0 at texel centers reproduces the checkerboard exactly
    n = 64
    centers = (jnp.stack(jnp.meshgrid(jnp.arange(8), jnp.arange(8),
                                      indexing="ij"), -1).reshape(-1, 2)
               * 8 + 4.0 + 0.0) / n  # block centers
    v0 = sample_trilinear(checker, centers, jnp.zeros(centers.shape[0]))
    yy = (centers[:, 0] * n).astype(int) // 8
    xx = (centers[:, 1] * n).astype(int) // 8
    expect = ((xx + yy) % 2).astype(np.float32)
    # uv convention: (u, v) = (x, y) or (y, x) — accept the one the
    # implementation uses, but it must be exact
    got = np.asarray(v0[:, 0])
    assert (np.abs(got - np.asarray(expect)).max() < 1e-5
            or np.abs(got - np.asarray(((yy + xx) % 2))).max() < 1e-5)
    # max lod collapses to the global mean everywhere
    vmax = sample_trilinear(checker, uv,
                            jnp.full((uv.shape[0],), 99.0))
    np.testing.assert_allclose(np.asarray(vmax[:, 0]), 0.5, atol=1e-5)
    # lod monotonically reduces contrast
    spans = []
    for lod in (0.0, 2.0, 4.0, 6.0):
        v = np.asarray(sample_trilinear(checker, uv,
                                        jnp.full((uv.shape[0],), lod)))
        spans.append(v[:, 0].max() - v[:, 0].min())
    assert spans[0] >= spans[1] >= spans[2] >= spans[3]


def test_triplanar_axis_faces_pick_single_plane(checker):
    """On an axis-aligned face the blend weight collapses to one plane, so
    the result must equal that plane's direct sample."""
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(-4, 4, (128, 3)), jnp.float32)
    cone = jnp.zeros((128,), jnp.float32)
    for axis in range(3):
        n = np.zeros((128, 3), np.float32)
        n[:, axis] = 1.0
        out = triplanar_sample(checker, pos, jnp.asarray(n), cone,
                               world_scale=0.25)
        other = [0, 1, 2]
        other.remove(axis)
        uv = jnp.mod(jnp.stack([pos[:, other[0]], pos[:, other[1]]],
                               axis=-1) * 0.25, 1.0)
        direct = sample_trilinear(checker, uv, jnp.zeros((128,)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                                   atol=1e-5)


def test_triplanar_cone_width_drives_lod(checker):
    pos = jnp.asarray(np.random.default_rng(2).uniform(-4, 4, (256, 3)),
                      jnp.float32)
    n = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (256, 1))
    sharp = np.asarray(triplanar_sample(checker, pos, n,
                                        jnp.zeros((256,))))
    blurred = np.asarray(triplanar_sample(checker, pos, n,
                                          jnp.full((256,), 10.0)))
    assert sharp[:, 0].std() > blurred[:, 0].std()
    np.testing.assert_allclose(blurred[:, 0], 0.5, atol=0.05)


def test_soil_textures_valid():
    soil = make_soil_textures(64)
    for mip in (soil.albedo_ao, soil.normal_rough):
        t = np.asarray(mip.texels)
        assert np.isfinite(t).all()
    s = soil.albedo_ao.base_size
    alb = np.asarray(soil.albedo_ao.texels[:s * s]).reshape(s, s, 4)
    assert (alb[..., :3] >= 0).all() and (alb[..., :3] <= 1).all()
    nrm = np.asarray(soil.normal_rough.texels[:s * s]).reshape(s, s, 4)
    ln = np.linalg.norm(nrm[..., :3], axis=-1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-4)
    assert (nrm[..., 1] > 0).all()  # y-up tangent normals


def test_apply_normal_map_properties(rng):
    n_geom = rng.normal(size=(64, 3))
    n_geom /= np.linalg.norm(n_geom, axis=1, keepdims=True)
    n_geom = jnp.asarray(n_geom, jnp.float32)
    # identity-ish texture normal keeps the geometric normal
    flat = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (64, 1))
    out = apply_normal_map(n_geom, flat)
    dots = np.sum(np.asarray(out) * np.asarray(n_geom), axis=1)
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)
    # perturbed normals stay unit length and hemisphere-aligned
    pert = jnp.asarray(np.stack([
        0.4 * np.sin(np.arange(64)), np.full(64, 0.8),
        0.4 * np.cos(np.arange(64))], axis=-1), jnp.float32)
    out2 = np.asarray(apply_normal_map(n_geom, pert))
    np.testing.assert_allclose(np.linalg.norm(out2, axis=1), 1.0, atol=1e-5)
    assert (np.sum(out2 * np.asarray(n_geom), axis=1) > 0.2).all()
