"""Unit tests for core math, color, geometry intersectors, camera."""

import jax.numpy as jnp
import numpy as np
import pytest

from rtrt_tpu.core import vecmath as vm
from rtrt_tpu.core import color as col
from rtrt_tpu.core import geometry as geo
from rtrt_tpu.core.camera import (camera_basis, make_camera, motion_vector,
                                  pixel_to_dir, world_to_screen)


def test_normalize_safe():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
    n = vm.normalize(v)
    np.testing.assert_allclose(np.asarray(vm.length(n)), [1.0, 0.0], atol=1e-6)


def test_reflect_refract():
    d = vm.normalize(jnp.array([[1.0, -1.0, 0.0]]))
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = vm.reflect(d, n)
    np.testing.assert_allclose(np.asarray(r), np.asarray(vm.normalize(jnp.array([[1.0, 1.0, 0.0]]))), atol=1e-6)
    # straight-through refraction at eta=1
    refr, tir = vm.refract(d, n, jnp.ones(()))
    assert not bool(tir[0])
    np.testing.assert_allclose(np.asarray(refr), np.asarray(d), atol=1e-6)
    # total internal reflection: grazing exit from dense medium
    d2 = vm.normalize(jnp.array([[1.0, -0.05, 0.0]]))
    _, tir2 = vm.refract(d2, n, jnp.full((), 1.5))
    assert bool(tir2[0])


def test_orthonormal_basis():
    rng = np.random.default_rng(0)
    n = vm.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    t, b = vm.orthonormal_basis(n)
    np.testing.assert_allclose(np.asarray(vm.dot(t, n)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(b, n)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(t, b)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.length(t)), 1, atol=1e-5)
    # right-handedness: cross(t, b) == n
    np.testing.assert_allclose(np.asarray(vm.cross(t, b)), np.asarray(n), atol=1e-5)


def test_permute3():
    v = jnp.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    k = jnp.array([2, 0], jnp.int32), jnp.array([0, 1], jnp.int32), jnp.array([1, 2], jnp.int32)
    out = vm.permute3(v, *k)
    np.testing.assert_allclose(np.asarray(out), [[3, 1, 2], [4, 5, 6]])


def test_rotation_matrix():
    v = jnp.array([1.0, 0.0, 0.0])
    r = vm.rotate_axis_angle(v, jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
    np.testing.assert_allclose(np.asarray(r), [0, 1, 0], atol=1e-6)


def test_quat_matches_matrix():
    rng = np.random.default_rng(3)
    axis = vm.normalize(jnp.asarray(rng.normal(size=(8, 3)), jnp.float32))
    ang = jnp.asarray(rng.uniform(-3, 3, size=(8,)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    q = vm.quat_from_axis_angle(axis, ang)
    np.testing.assert_allclose(np.asarray(vm.quat_rotate(q, v)),
                               np.asarray(vm.rotate_axis_angle(v, axis, ang)),
                               atol=1e-4)


def test_color_roundtrips():
    rng = np.random.default_rng(1)
    c = jnp.asarray(rng.uniform(0, 1, size=(32, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(col.ycocg_to_rgb(col.rgb_to_ycocg(c))),
                               np.asarray(c), atol=1e-5)
    np.testing.assert_allclose(np.asarray(col.xyz_to_srgb(col.srgb_to_xyz(c))),
                               np.asarray(c), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(col.srgb_gamma_to_linear(col.linear_to_srgb_gamma(c))),
        np.asarray(c), atol=1e-3)


def test_luminance():
    white = jnp.ones((1, 3))
    np.testing.assert_allclose(np.asarray(col.luminance(white)), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# intersectors
# ---------------------------------------------------------------------------


def test_ray_aabb():
    org = jnp.array([[0.0, 0.0, -5.0], [0.0, 10.0, -5.0], [0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]] * 3)
    aux = geo.make_ray_aux(d)
    lo = jnp.full((3, 3), -1.0)
    hi = jnp.full((3, 3), 1.0)
    hit, t = geo.ray_aabb(org, aux.inv_dir, lo, hi)
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(float(t[0]), 4.0, atol=1e-5)
    assert bool(hit[2])  # origin inside the box


def test_ray_aabb_axis_aligned_on_face():
    # ray sliding exactly on a box face must not produce NaN breakage
    org = jnp.array([[-5.0, 1.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    aux = geo.make_ray_aux(d)
    hit, t = geo.ray_aabb(org, aux.inv_dir, jnp.array([[-1.0, -1, -1]]),
                          jnp.array([[1.0, 1, 1]]))
    assert np.isfinite(np.asarray(t)).all()


def test_triangle_watertight_vs_mt(rng):
    n = 256
    v0 = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    v1 = v0 + jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    v2 = v0 + jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    org = jnp.asarray(rng.uniform(-3, 3, (n, 3)), jnp.float32)
    dirs = vm.normalize(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32))
    aux = geo.make_ray_aux(dirs)
    wt = geo.ray_triangle_watertight(org, aux, v0, v1, v2)
    mt = geo.ray_triangle_mt(org, dirs, v0, v1, v2)
    agree = np.asarray(wt.hit) == np.asarray(mt.hit)
    assert agree.mean() > 0.995  # boundary cases may differ by design
    both = np.asarray(wt.hit) & np.asarray(mt.hit)
    np.testing.assert_allclose(np.asarray(wt.t)[both], np.asarray(mt.t)[both],
                               rtol=1e-3, atol=1e-4)


def test_triangle_watertight_shared_edge():
    """A ray aimed exactly at a shared edge must hit at least one of the two
    triangles (the watertightness guarantee)."""
    # quad split into two tris sharing the diagonal (0,0,0)-(1,1,0)
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([1.0, 0.0, 0.0])
    c = jnp.array([1.0, 1.0, 0.0])
    d = jnp.array([0.0, 1.0, 0.0])
    v0 = jnp.stack([a, a])
    v1 = jnp.stack([b, c])
    v2 = jnp.stack([c, d])
    # rays through points exactly on the diagonal
    ts = np.linspace(0.05, 0.95, 64).astype(np.float32)
    org = jnp.stack([jnp.asarray(ts), jnp.asarray(ts), jnp.full(64, -3.0)], -1)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (64, 1))
    aux = geo.make_ray_aux(dirs)
    hit_any = np.zeros(64, bool)
    for i in range(2):
        h = geo.ray_triangle_watertight(org, aux, v0[i][None], v1[i][None], v2[i][None])
        hit_any |= np.asarray(h.hit)[:, 0] if h.hit.ndim == 2 else np.asarray(h.hit)
    assert hit_any.all()


def test_ray_sphere_plane():
    org = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit, t = geo.ray_sphere(org, d, jnp.zeros((1, 3)), jnp.ones((1,)))
    assert bool(hit[0]) and abs(float(t[0]) - 4.0) < 1e-5
    # from inside
    hit2, t2 = geo.ray_sphere(jnp.zeros((1, 3)), d, jnp.zeros((1, 3)), jnp.ones((1,)))
    assert bool(hit2[0]) and abs(float(t2[0]) - 1.0) < 1e-5
    hitp, tp = geo.ray_plane(org, d, jnp.array([[0.0, 0.0, -1.0]]), jnp.zeros((1,)))
    assert bool(hitp[0]) and abs(float(tp[0]) - 5.0) < 1e-5


# ---------------------------------------------------------------------------
# camera
# ---------------------------------------------------------------------------


def test_camera_center_ray():
    cam = make_camera(pos=(1.0, 2.0, 3.0), yaw=0.3, pitch=-0.1)
    basis = camera_basis(cam)
    d = pixel_to_dir(basis, jnp.array([[0.5, 0.5]]), 16 / 9)
    np.testing.assert_allclose(np.asarray(d)[0], np.asarray(basis.forward), atol=1e-6)


def test_camera_roundtrip_project():
    cam = make_camera(pos=(0.0, 1.0, 0.0), yaw=0.7, pitch=0.2, fov_y=1.2)
    basis = camera_basis(cam)
    uv = jnp.asarray(np.random.default_rng(5).uniform(0.1, 0.9, (32, 2)), jnp.float32)
    d = pixel_to_dir(basis, uv, 1.5)
    p = basis.pos + d * 7.0
    uv2, z = world_to_screen(basis, p, 1.5)
    assert (np.asarray(z) > 0).all()
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-4)


def test_motion_vector_static_camera_is_zero():
    cam = make_camera()
    basis = camera_basis(cam)
    uv = jnp.array([[0.25, 0.75]])
    p = basis.pos + pixel_to_dir(basis, uv, 1.0) * 4.0
    mv = motion_vector(basis, uv, p, 1.0)
    np.testing.assert_allclose(np.asarray(mv), 0.0, atol=1e-5)
