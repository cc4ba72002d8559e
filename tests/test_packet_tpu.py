"""TPU-only: Pallas packet traversal vs the XLA wavefront oracle.

Skipped on CPU (the packet kernel needs a real TPU backend); on the attached
chip this is the correctness gate for the hot path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

needs_tpu = pytest.mark.skipif(jax.default_backend() == "cpu",
                               reason="packet kernel needs a TPU backend")


@needs_tpu
def test_packet_matches_wavefront(rng):
    from rtrt_tpu.bvh.build import build_scene_bvh
    from rtrt_tpu.bvh.packet import pack_for_packets, packet_intersect
    from rtrt_tpu.bvh.traverse import intersect_scene
    from rtrt_tpu.bvh.types import BATCH_SIZE
    from rtrt_tpu.core.vecmath import normalize

    # structured scene: heightfield + floating blockers
    num = 900
    c = rng.uniform(-10, 10, (num, 3)).astype(np.float32)
    c[:, 1] = np.sin(c[:, 0]) * np.cos(c[:, 2])
    c[600:, 1] += rng.uniform(2, 6, 300).astype(np.float32)
    e1 = rng.uniform(-0.6, 0.6, (num, 3)).astype(np.float32)
    e2 = rng.uniform(-0.6, 0.6, (num, 3)).astype(np.float32)
    total = 2 * BATCH_SIZE
    z = np.zeros((total - num, 3), np.float32)
    stack = lambda a: jnp.asarray(np.concatenate([a, z]).reshape(2, BATCH_SIZE, 3))
    valid = jnp.asarray(np.concatenate(
        [np.ones(num, bool), np.zeros(total - num, bool)]).reshape(2, BATCH_SIZE))
    bvh = jax.jit(build_scene_bvh)(stack(c), stack(c + e1), stack(c + e2), valid)

    n = 4096
    org = jnp.asarray(rng.uniform(-12, 12, (n, 3)).astype(np.float32))
    dirs = normalize(jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)))

    # per-vertex normals: constant up — interpolation must return it exactly
    t_count = bvh.tris_t.shape[1]
    up = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (t_count, 1)).T
    tri_nrm_t = jnp.asarray(np.concatenate([up, up, up], axis=0))
    tri_mat = jnp.asarray((np.arange(t_count) % 5).astype(np.int32))
    tables = jax.jit(pack_for_packets)(bvh, tri_nrm_t, tri_mat)
    ph = jax.jit(lambda t, o, d: packet_intersect(
        t, o, d, tlas_internal=bvh.tlas_internal))(tables, org, dirs)
    wf = jax.jit(lambda b, o, d: intersect_scene(b, o, d, max_steps=16384))(
        bvh, org, dirs)

    pt, wt = np.asarray(ph.t), np.asarray(wf.t)
    assert (np.isfinite(pt) == np.isfinite(wt)).mean() > 0.999
    m = np.isfinite(pt) & np.isfinite(wt)
    np.testing.assert_allclose(pt[m], wt[m], rtol=1e-4, atol=1e-4)
    # in-kernel surface attributes: interpolated normal == the constant up
    ns = np.asarray(ph.ns)[m]
    np.testing.assert_allclose(ns, [[0, 1, 0]] * ns.shape[0], atol=1e-4)
    # material ids round-trip through the kernel
    mats = np.asarray(ph.mat)[m]
    tris = np.asarray(ph.tri)[m]
    np.testing.assert_array_equal(mats, tris % 5)


@needs_tpu
def test_packet_anyhit_tmax(rng):
    from rtrt_tpu.bvh.build import build_scene_bvh
    from rtrt_tpu.bvh.packet import pack_for_packets, packet_intersect
    from rtrt_tpu.bvh.types import BATCH_SIZE

    big = 50.0
    v0 = np.array([[-big, -big, 0.0]], np.float32)
    v1 = np.array([[big, -big, 0.0]], np.float32)
    v2 = np.array([[0.0, big, 0.0]], np.float32)
    total = 2 * BATCH_SIZE
    z = np.zeros((total - 1, 3), np.float32)
    stack = lambda a: jnp.asarray(np.concatenate([a, z]).reshape(2, BATCH_SIZE, 3))
    valid = jnp.asarray(np.concatenate(
        [np.ones(1, bool), np.zeros(total - 1, bool)]).reshape(2, BATCH_SIZE))
    bvh = jax.jit(build_scene_bvh)(stack(v0), stack(v1), stack(v2), valid)
    tables = jax.jit(pack_for_packets)(bvh)

    org = jnp.tile(jnp.array([[0.0, 0.0, -5.0]]), (8, 1))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
    t_max = jnp.asarray([10.0, 10.0, 1.0, 1.0, 10.0, 0.0, 10.0, 10.0])
    h = jax.jit(lambda t, o, d, tm: packet_intersect(
        t, o, d, tm, any_hit=True,
        tlas_internal=bvh.tlas_internal))(tables, org, dirs, t_max)
    tri = np.asarray(h.tri)
    assert tri[0] >= 0 and tri[1] >= 0      # blocker at t=5 within 10
    assert tri[2] < 0 and tri[3] < 0        # t_max=1 < 5: unoccluded
    assert tri[5] < 0                        # t_max=0: lane disabled


def test_packet_interpret_matches_wavefront(rng):
    """CPU (interpret-mode) twin of the TPU cross-check: guards the
    traversal rewrite (ordered pruning, scene-exit caps) without hardware.
    Smaller scene/ray count — the interpreter pays per step."""
    from rtrt_tpu.bvh.build import build_scene_bvh
    from rtrt_tpu.bvh.packet import TILE, pack_for_packets, packet_intersect
    from rtrt_tpu.bvh.traverse import intersect_scene
    from rtrt_tpu.bvh.types import BATCH_SIZE
    from rtrt_tpu.core.vecmath import normalize

    num = 300
    c = rng.uniform(-8, 8, (num, 3)).astype(np.float32)
    c[:, 1] = np.sin(c[:, 0]) * np.cos(c[:, 2])
    c[200:, 1] += rng.uniform(2, 5, 100).astype(np.float32)
    e1 = rng.uniform(-0.7, 0.7, (num, 3)).astype(np.float32)
    e2 = rng.uniform(-0.7, 0.7, (num, 3)).astype(np.float32)
    total = 2 * BATCH_SIZE
    z = np.zeros((total - num, 3), np.float32)
    stack = lambda a: jnp.asarray(
        np.concatenate([a, z]).reshape(2, BATCH_SIZE, 3))
    valid = jnp.asarray(np.concatenate(
        [np.ones(num, bool),
         np.zeros(total - num, bool)]).reshape(2, BATCH_SIZE))
    bvh = jax.jit(build_scene_bvh)(stack(c), stack(c + e1), stack(c + e2),
                                   valid)
    tables = jax.jit(pack_for_packets)(bvh)

    n = TILE  # exactly one packet tile
    # mix: coherent down-looking rays (prunable) + random rays (incl. sky)
    org = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    org[: n // 2, 1] = 9.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[: n // 2, 1] = -np.abs(d[: n // 2, 1]) - 1.0
    dirs = normalize(jnp.asarray(d))
    org = jnp.asarray(org)

    ph = packet_intersect(tables, org, dirs, tlas_internal=bvh.tlas_internal,
                          interpret=True)
    wf = jax.jit(lambda b, o, dd: intersect_scene(b, o, dd, max_steps=8192))(
        bvh, org, dirs)
    pt, wt = np.asarray(ph.t), np.asarray(wf.t)
    assert (np.isfinite(pt) == np.isfinite(wt)).mean() > 0.999
    m = np.isfinite(pt) & np.isfinite(wt)
    np.testing.assert_allclose(pt[m], wt[m], rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_packet_interpret_moller_trumbore(rng, monkeypatch):
    """The Möller-Trumbore leaf test (the default leaf test: precomputed-edge
    rows, division-free accept) must agree with the watertight default on
    hit distances and barycentrics.  TRI_TEST is monkeypatched (pack layout
    and kernel read the module global at call/trace time)."""
    from rtrt_tpu.bvh import packet as pk
    from rtrt_tpu.bvh.build import build_scene_bvh
    from rtrt_tpu.bvh.traverse import intersect_scene
    from rtrt_tpu.bvh.types import BATCH_SIZE
    from rtrt_tpu.core.vecmath import normalize

    num = 300
    c = rng.uniform(-8, 8, (num, 3)).astype(np.float32)
    c[:, 1] = np.sin(c[:, 0]) * np.cos(c[:, 2])
    e1 = rng.uniform(-0.7, 0.7, (num, 3)).astype(np.float32)
    e2 = rng.uniform(-0.7, 0.7, (num, 3)).astype(np.float32)
    total = 2 * BATCH_SIZE
    z = np.zeros((total - num, 3), np.float32)
    stack = lambda a: jnp.asarray(
        np.concatenate([a, z]).reshape(2, BATCH_SIZE, 3))
    valid = jnp.asarray(np.concatenate(
        [np.ones(num, bool),
         np.zeros(total - num, bool)]).reshape(2, BATCH_SIZE))
    bvh = jax.jit(build_scene_bvh)(stack(c), stack(c + e1), stack(c + e2),
                                   valid)

    monkeypatch.setattr(pk, "TRI_TEST", "mt")
    tables = pk.pack_for_packets(bvh)

    n = pk.TILE
    org = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    org[:, 1] = 9.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 1] = -np.abs(d[:, 1]) - 1.0
    dirs = normalize(jnp.asarray(d))
    org = jnp.asarray(org)

    ph = pk.packet_intersect(tables, org, dirs,
                             tlas_internal=bvh.tlas_internal, interpret=True)
    wf = jax.jit(lambda b, o, dd: intersect_scene(b, o, dd, max_steps=8192))(
        bvh, org, dirs)
    pt, wt = np.asarray(ph.t), np.asarray(wf.t)
    assert (np.isfinite(pt) == np.isfinite(wt)).mean() > 0.998
    m = np.isfinite(pt) & np.isfinite(wt)
    np.testing.assert_allclose(pt[m], wt[m], rtol=1e-4, atol=1e-4)
    same_tri = np.asarray(ph.tri)[m] == np.asarray(wf.tri)[m]
    uu = np.asarray(ph.u)[m][same_tri]
    vv = np.asarray(ph.v)[m][same_tri]
    np.testing.assert_allclose(uu, np.asarray(wf.u)[m][same_tri], atol=2e-3)
    np.testing.assert_allclose(vv, np.asarray(wf.v)[m][same_tri], atol=2e-3)


@pytest.mark.slow
def test_packet_interpret_attr_hbm_matches_staged(rng):
    """attr_hbm mode (attribute table left in HBM; resolve loop DMAs single
    records on demand) returns bit-identical hits/attributes to the fully
    VMEM-staged path — the mechanism that raises the packet path's scene
    ceiling to the reference's ~1M-tri envelope (src/kernel.cuh:54-55)."""
    from rtrt_tpu.bvh.packet import (pack_for_packets, pack_nodes4,
                                     packet_intersect)
    from rtrt_tpu.bvh.sah import build_scene_tables_sah, bvh4_nodes
    from rtrt_tpu.core.vecmath import normalize
    from rtrt_tpu.engine.scene import build_demo_scene, padded_arrays

    scene = build_demo_scene()
    pad = padded_arrays(scene)
    bvh, nrm_t, mat_s = build_scene_tables_sah(
        scene.num_batches, jnp.asarray(pad["indices"]),
        jnp.asarray(pad["tri_mat"]), jnp.asarray(pad["valid"]),
        jnp.asarray(scene.vertices), jnp.asarray(scene.normals), leaf_max=8)
    tables = pack_for_packets(bvh, nrm_t, mat_s)
    tables = tables._replace(nodes_f32=pack_nodes4(bvh4_nodes(bvh)))

    n = 1024
    org = jnp.asarray(
        np.array([[0, 6, -14]]) + rng.normal(0, 0.5, (n, 3)), jnp.float32)
    dirs = normalize(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32))

    kw = dict(tlas_internal=max(0, bvh.tlas_internal), arity=4, leaf_width=8,
              interpret=True)
    h0 = packet_intersect(tables, org, dirs, **kw)
    h1 = packet_intersect(tables, org, dirs, attr_hbm=True, **kw)
    for name in ("tri", "mat"):
        np.testing.assert_array_equal(np.asarray(getattr(h0, name)),
                                      np.asarray(getattr(h1, name)),
                                      err_msg=name)
    for name in ("t", "u", "v", "ns", "ng"):
        # accept-time vs resolve-time attribute interpolation may differ by
        # 1 ULP (FMA contraction context); anything larger is a real bug
        np.testing.assert_allclose(np.asarray(getattr(h0, name)),
                                   np.asarray(getattr(h1, name)),
                                   rtol=3e-7, atol=1e-7, err_msg=name)
