"""Tests: config system, image I/O, SSIM, halfedge mesh,
block mesher, water/stars, camera persistence, parallel tile frame."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtrt_tpu.content.halfedge import HalfedgeMesh
from rtrt_tpu.content.mesher import voxels_to_mesh
from rtrt_tpu.core.vecmath import normalize
from rtrt_tpu.utils.config import (PARAM_REGISTRY, FeatureFlags,
                                   GlobalSettings, default_params, get_param,
                                   load_config, set_param)
from rtrt_tpu.utils.image import read_png, read_ppm, write_png, write_ppm
from rtrt_tpu.utils.ssim import ssim
from rtrt_tpu.utils.timer import ScopeTimer, Timer


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


def test_toml_config_roundtrip(tmp_path):
    path = tmp_path / "c.toml"
    path.write_text("""
render_width = 640
render_height = 360
scene = "demo"
[dynamic_resolution]
enabled = false
target_fps = 30.0
""")
    s = load_config(str(path))
    assert s.render_width == 640 and s.scene == "demo"
    assert not s.dynamic_resolution.enabled
    assert s.dynamic_resolution.target_fps == 30.0
    # defaults for missing keys
    assert s.terrain_chunks == 4


def test_param_registry_paths_valid():
    p = default_params()
    for (path, _label, _w, lo, hi, _log) in PARAM_REGISTRY:
        v = float(get_param(p, path))
        assert lo <= v <= hi, path


def test_set_param_functional():
    p = default_params()
    p2 = set_param(p, "post.bloom_strength", 0.25)
    assert float(get_param(p2, "post.bloom_strength")) == 0.25
    assert float(get_param(p, "post.bloom_strength")) != 0.25


def test_feature_flags_hashable():
    assert hash(FeatureFlags()) == hash(FeatureFlags())
    assert hash(FeatureFlags(denoise=False)) != hash(FeatureFlags())


# ---------------------------------------------------------------------------
# image io + ssim
# ---------------------------------------------------------------------------


def test_png_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, (33, 47, 3)).astype(np.uint8)
    path = str(tmp_path / "t.png")
    write_png(path, img)
    back = read_png(path)
    np.testing.assert_array_equal(back, img)


def test_ppm_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, (16, 24, 3)).astype(np.uint8)
    path = str(tmp_path / "t.ppm")
    write_ppm(path, img)
    np.testing.assert_array_equal(read_ppm(path), img)


def test_ssim_metric(rng):
    a = rng.uniform(0, 255, (64, 64)).astype(np.float64)
    assert ssim(a, a) == pytest.approx(1.0)
    noisy = a + rng.normal(0, 25, a.shape)
    s = ssim(a, noisy)
    assert 0.0 < s < 0.99
    assert ssim(a, noisy) > ssim(a, rng.uniform(0, 255, a.shape))


# ---------------------------------------------------------------------------
# halfedge mesh + block mesher
# ---------------------------------------------------------------------------


def _tet():
    verts = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]], np.int32)
    return verts, faces


def test_halfedge_construct_validate():
    m = HalfedgeMesh.from_triangles(*_tet())
    assert m.validate()
    assert m.num_vertices() == 4 and m.num_faces() == 4 and m.num_edges() == 6
    v2, f2 = m.to_triangles()
    assert f2.shape == (4, 3)


def test_halfedge_subdivide_linear_and_loop():
    for mode in ("linear", "loop"):
        m = HalfedgeMesh.from_triangles(*_tet())
        m.subdivide(mode)
        assert m.validate()
        assert m.num_faces() == 16
        v, f = m.to_triangles()
        if mode == "loop":
            # smooth subdivision shrinks the hull
            assert np.linalg.norm(v, axis=-1).max() < np.sqrt(3)


def test_halfedge_edit_ops():
    m = HalfedgeMesh.from_triangles(*_tet())
    nf0 = m.num_faces()
    m.split_edge(0)
    assert m.validate()
    assert m.num_faces() == nf0 + 2
    # tet edge flips are degenerate (duplicate edges) and must be refused
    m2 = HalfedgeMesh.from_triangles(*_tet())
    assert not m2.flip_edge(0)
    # flip the diagonal of a quad: (0,1,2)+(0,2,3) -> (0,1,3)+(1,2,3)
    qv = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    qf = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mq = HalfedgeMesh.from_triangles(qv, qf)
    diag = next(e for e in range(mq.num_edges())
                if set(mq.edge_vertices(e)) == {0, 2})
    assert mq.flip_edge(diag)
    assert mq.validate()
    _, f2 = mq.to_triangles()
    assert {tuple(sorted(t)) for t in f2.tolist()} == {(0, 1, 3), (1, 2, 3)}
    m3 = HalfedgeMesh.from_triangles(*_tet())
    m3.collapse_edge(0)
    assert m3.validate()
    assert m3.num_faces() <= 2


def test_block_mesher_counts():
    solid = np.zeros((3, 3, 3), np.uint8)
    solid[1, 1, 1] = 1  # single cube: 6 faces = 12 tris
    v, f = voxels_to_mesh(solid)
    assert f.shape[0] == 12 and v.shape[0] == 8
    solid[1, 2, 1] = 1  # two stacked cubes: 10 faces = 20 tris
    v, f = voxels_to_mesh(solid)
    assert f.shape[0] == 20


# ---------------------------------------------------------------------------
# water + stars (dormant-feature parity)
# ---------------------------------------------------------------------------


def test_ocean_heightfield_and_intersect(rng):
    from rtrt_tpu.render.water import intersect_ocean, wave_height, wave_normal
    x = jnp.asarray(rng.uniform(-50, 50, 256).astype(np.float32))
    z = jnp.asarray(rng.uniform(-50, 50, 256).astype(np.float32))
    h = np.asarray(wave_height(x, z, jnp.float32(1.0)))
    assert np.abs(h).max() < 3.0 and h.std() > 0.05
    n = np.asarray(wave_normal(x, z, jnp.float32(1.0)))
    assert (n[:, 1] > 0).all()
    org = jnp.tile(jnp.array([[0.0, 10.0, 0.0]]), (64, 1))
    d = normalize(jnp.asarray(
        rng.normal(size=(64, 3)).astype(np.float32) * np.array([0.3, 0, 0.3])
        + np.array([0, -1.0, 0])))
    hit, t = intersect_ocean(org, d, jnp.float32(0.0))
    assert np.asarray(hit).mean() > 0.9
    p = np.asarray(org + d * t[..., None])[np.asarray(hit)]
    # refined hits land on the wave surface
    hs = np.asarray(wave_height(jnp.asarray(p[:, 0]), jnp.asarray(p[:, 2]),
                                jnp.float32(0.0)))
    assert np.abs(p[:, 1] - hs).max() < 0.2


def test_star_field_stable_and_sparse(rng):
    from rtrt_tpu.render.stars import star_field
    d = normalize(jnp.asarray(rng.normal(size=(4096, 3)).astype(np.float32)))
    s1 = np.asarray(star_field(d))
    s2 = np.asarray(star_field(d))
    np.testing.assert_array_equal(s1, s2)  # stable
    lum = s1.sum(-1)
    assert (lum > 0.01).mean() < 0.2  # sparse
    assert lum.max() > 0.05  # some stars exist


# ---------------------------------------------------------------------------
# multi-chip tile-parallel frame (8 virtual CPU devices)
# ---------------------------------------------------------------------------


def test_tile_parallel_dryrun(cpu_mesh_devices):
    import __graft_entry__ as ge
    # run the real dryrun on the CPU mesh by pointing jax.devices at cpu
    import jax
    cpu = jax.devices("cpu")
    assert len(cpu) >= 8
    # exercise the halo-exchange / psum path directly
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from rtrt_tpu.parallel.tile import AXIS, _global_histogram, _halo_exchange
    from rtrt_tpu.parallel.tile import SM_NOCHECK, shard_map

    mesh = Mesh(np.array(cpu[:4]), (AXIS,))
    img = jnp.arange(4 * 8 * 2 * 3, dtype=jnp.float32).reshape(32, 2, 3)

    def body(x):
        return _halo_exchange(x, 2, AXIS)

    out = shard_map(body, mesh=mesh, in_specs=P(AXIS), out_specs=P(AXIS),
                    **SM_NOCHECK)(img)
    out = np.asarray(out)
    assert out.shape == (4 * (8 + 4), 2, 3)
    # middle shard's upper halo equals the previous shard's bottom rows
    ref = np.asarray(img)
    shard1 = out[12:24]  # shard 1 block with halos
    np.testing.assert_allclose(shard1[:2], ref[6:8])   # halo from shard 0
    np.testing.assert_allclose(shard1[2:10], ref[8:16])  # own rows

    def hist_body(x):
        return _global_histogram(x, AXIS)

    lum = jnp.abs(img[..., 0])
    h = shard_map(hist_body, mesh=mesh, in_specs=P(AXIS),
                  out_specs=P(), **SM_NOCHECK)(lum)
    assert float(jnp.sum(h)) == lum.size


# ---------------------------------------------------------------------------
# camera persistence via Engine API (no rendering — init only)
# ---------------------------------------------------------------------------


def test_camera_json_roundtrip(tmp_path):
    from rtrt_tpu.core.camera import make_camera
    import json as _json
    # emulate Engine.save/load without building an Engine (fast)
    cam = make_camera(pos=(1, 2, 3), yaw=0.5, pitch=-0.2, fov_y=1.2,
                      aperture=0.02, focal_dist=7.5)
    path = str(tmp_path / "cam.json")
    data = dict(pos=[float(x) for x in np.asarray(cam.pos)],
                yaw=float(cam.yaw), pitch=float(cam.pitch),
                fov_y=float(cam.fov_y), aperture=float(cam.aperture),
                focal_dist=float(cam.focal_dist))
    with open(path, "w") as f:
        _json.dump(data, f)
    with open(path) as f:
        d = _json.load(f)
    cam2 = make_camera(pos=tuple(d["pos"]), yaw=d["yaw"], pitch=d["pitch"],
                       fov_y=d["fov_y"], aperture=d["aperture"],
                       focal_dist=d["focal_dist"])
    np.testing.assert_allclose(np.asarray(cam2.pos), np.asarray(cam.pos))
    assert float(cam2.focal_dist) == 7.5


# ---------------------------------------------------------------------------
# dynamic-resolution controller (host logic, no rendering)
# ---------------------------------------------------------------------------


def test_dynamic_resolution_controller():
    from rtrt_tpu.engine import engine as E

    class FakeEngine:
        _BUCKETS = E._BUCKET_HEIGHTS
        def __init__(self):
            from rtrt_tpu.utils.config import (DynamicResolution,
                                               GlobalSettings)
            self.settings = GlobalSettings(
                render_height=1080,
                dynamic_resolution=DynamicResolution(
                    enabled=True, target_fps=60.0, deadband_fps=2.0))
            self._cur_bucket = 540
            self.switched = []
        def _set_bucket(self, b):
            self._cur_bucket = b
            self.switched.append(b)
        def _precompile_neighbors(self):
            self.warmed.append(self._cur_bucket)
        warmed = []
        _dynamic_resolution_step = E.Engine._dynamic_resolution_step

    f = FakeEngine()
    f._dynamic_resolution_step(1 / 20)  # 20 fps: drop a bucket
    assert f._cur_bucket == 360
    f._dynamic_resolution_step(1 / 200)  # very fast: climb
    assert f._cur_bucket == 540
    f._dynamic_resolution_step(1 / 61)  # inside deadband: no change
    assert f.switched == [360, 540]
    # every switch kicks a neighbor warm (background precompile)
    assert f.warmed == [360, 540]
    # never exceeds the configured max height
    f._cur_bucket = 1080
    f._dynamic_resolution_step(1 / 500)
    assert f._cur_bucket == 1080


def test_precompile_neighbors_targets():
    """_precompile_neighbors warms exactly the +/-1 buckets (bounded by the
    configured max height) in background threads, skipping buckets that are
    already compiled or in flight."""
    from rtrt_tpu.engine import engine as E

    class FakeEngine:
        def __init__(self, cur, max_h):
            from rtrt_tpu.utils.config import GlobalSettings
            self.settings = GlobalSettings(render_height=max_h)
            self._cur_bucket = cur
            self._frame_fns = {cur: object()}
            self._precompiling = set()
            self.asked = []
        def _precompile_bucket_async(self, b):
            self.asked.append(b)
        _precompile_neighbors = E.Engine._precompile_neighbors

    f = FakeEngine(cur=540, max_h=1080)
    f._precompile_neighbors()
    assert f.asked == [360, 720]
    # at the top bucket allowed by settings: only the lower neighbor
    f = FakeEngine(cur=1080, max_h=1080)
    f._precompile_neighbors()
    assert f.asked == [720]
    # at the bottom bucket: only the upper neighbor
    f = FakeEngine(cur=270, max_h=1080)
    f._precompile_neighbors()
    assert f.asked == [360]


def test_precompile_bucket_async_runs(monkeypatch):
    """The async warm compiles via make_frame_fn and registers the fn in
    _frame_fns; duplicate/in-flight/compiled buckets are skipped."""
    import threading

    from rtrt_tpu.engine import engine as E

    calls = []
    done = threading.Event()

    class FakeFn:
        def __call__(self, *a):
            return ()

    def fake_make_frame_fn(static, refit_plan=None):
        calls.append((static.render_w, static.render_h))
        return FakeFn()

    monkeypatch.setattr(E, "make_frame_fn", fake_make_frame_fn)
    monkeypatch.setattr(E.jax, "block_until_ready",
                        lambda x: done.set())

    class FakeEngine:
        def __init__(self):
            from rtrt_tpu.utils.config import FeatureFlags, GlobalSettings
            self.settings = GlobalSettings(render_height=1080)
            self.flags = FeatureFlags()
            self._frame_fns = {540: object()}
            self._precompiling = set()
            self._refit_plan = None
            # frame args (content irrelevant — FakeFn ignores them)
            self.indices = self.tri_mat = self.valid = None
            self.materials = self.textures = self.sky = self.lights = None
            self.camera = self.params = None
            self.prebuilt = None
            self.state = E.FrameState(
                vertices=None, normals=None, history=None, exposure=None,
                frame_idx=None, time=None)
        _static_for = E.Engine._static_for
        _precompile_bucket_async = E.Engine._precompile_bucket_async

        class scene:  # noqa: N801 — attribute stand-in
            num_batches = 1

        animation = "none"

    f = FakeEngine()
    f._precompile_bucket_async(540)   # already compiled: no-op
    assert calls == []
    f._precompile_bucket_async(360)
    assert done.wait(timeout=10.0)
    # wait for the worker to finish bookkeeping
    for _ in range(100):
        if 360 in f._frame_fns:
            break
        import time
        time.sleep(0.05)
    assert calls == [E._res_for_height(360)]
    assert 360 in f._frame_fns and 360 not in f._precompiling


def test_halfedge_subdivide_catmull_clark():
    """Catmull-Clark (reference: meshedit.cpp:368): each tri -> 3 quads
    (6 stored tris); closed mesh stays closed; hull shrinks (smooth);
    centroid is preserved for the symmetric tetrahedron."""
    m = HalfedgeMesh.from_triangles(*_tet())
    m.subdivide("catmull_clark")
    assert m.validate()
    # 4 tris * 3 quads * 2 tris-per-quad
    assert m.num_faces() == 24
    # V = 4 old + 6 edge + 4 face points
    assert m.num_vertices() == 14
    v, f = m.to_triangles()
    # closed 2-manifold: every edge shared by exactly two faces
    cnt = {}
    for (a, b, c) in f.tolist():
        for u, w in ((a, b), (b, c), (c, a)):
            cnt[(min(u, w), max(u, w))] = cnt.get((min(u, w), max(u, w)), 0) + 1
    assert set(cnt.values()) == {2}
    # smooth rule pulls vertices inside the original hull
    assert np.linalg.norm(v, axis=-1).max() < np.sqrt(3)
    assert np.abs(v.mean(axis=0)).max() < 1e-5


def test_halfedge_catmull_clark_boundary():
    """Open quad: boundary edge points stay at midpoints, boundary verts
    follow the 1/8-3/4-1/8 crease rule (stay on the boundary line)."""
    qv = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    qf = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    m = HalfedgeMesh.from_triangles(qv, qf)
    m.subdivide("catmull_clark")
    assert m.validate()
    v, f = m.to_triangles()
    # planar input stays planar
    assert np.abs(v[:, 2]).max() == 0.0
    # the four original corners remain in [0,1]^2 (crease rule is convex)
    assert v.min() >= -1e-6 and v.max() <= 1.0 + 1e-6


def test_nan_guards_live_in_frame(capfd):
    """RTRT_DEBUG wiring: nan_guard is invoked inside the frame program
    (reference wires NAN_DETECTER into its hot kernels,
    src/pathtrace.cuh:113-117).  Force-enable and check it both reports
    and zeroes an injected NaN."""
    import jax.numpy as jnp
    from rtrt_tpu.utils.debug import nan_guard
    x = jnp.array([1.0, jnp.nan, jnp.inf])
    y = nan_guard(x, "test", enabled=True)
    out, _ = capfd.readouterr()
    assert "bad values: 2" in out
    assert jnp.all(jnp.isfinite(y)) and float(y[0]) == 1.0
    # and the frame module calls it on the trace outputs
    import inspect
    from rtrt_tpu.engine import frame
    src = inspect.getsource(frame.render_frame)
    assert 'nan_guard' in src and 'trace.radiance' in src


def test_packet_tables_fit_gate():
    """Scene-size gating (reference envelope: 1M tris, src/kernel.cuh:54-55):
    small scenes stage ALL tables into VMEM ("full"); the ~1M-tri envelope
    rides the packet path with the attribute table left in HBM
    ("attr_hbm", resolve-loop record DMAs); only scenes beyond even that
    fall back to the wavefront traverser ("none")."""
    from rtrt_tpu.engine.engine import packet_fit_mode, packet_tables_fit
    assert packet_fit_mode(36) == "full"       # terrain (36.8k tris)
    assert packet_fit_mode(226) == "full"      # terrain_big (231k tris)
    assert packet_fit_mode(1004) == "attr_hbm"  # terrain_huge (1.03M tris)
    assert packet_fit_mode(2800) == "none"     # beyond the nodes+tris budget
    # two-level LBVH trees (no SAH collapse) pay ~64 B/tri of nodes: the
    # 1M envelope does NOT fit even attr_hbm there
    assert packet_fit_mode(1004, sah_leaf8=False) == "none"
    assert packet_tables_fit(226) and packet_tables_fit(1004)
    assert not packet_tables_fit(2800)


def test_wavefront_fence_beyond_envelope(monkeypatch):
    """Beyond the packet VMEM envelope the TPU has no working product-scale
    path (the XLA wavefront fallback device-faults above demo resolution,
    PARITY.md envelope table) — the engine must hard-reject the config
    with a clear error instead of silently reaching a faulting path."""
    from rtrt_tpu.engine import engine as eng_mod
    from rtrt_tpu.utils.config import DynamicResolution, GlobalSettings
    monkeypatch.setattr(eng_mod, "_tpu_available", lambda: True)
    monkeypatch.setenv("RTRT_VMEM_TABLE_BUDGET_MB", "0.001")
    monkeypatch.delenv("RTRT_ALLOW_WAVEFRONT", raising=False)
    settings = GlobalSettings(
        render_width=1920, render_height=1080, scene="demo",
        texture_size=32,
        dynamic_resolution=DynamicResolution(enabled=False))
    with pytest.raises(RuntimeError, match="packet-traversal VMEM envelope"):
        eng_mod.Engine(settings)
    # demo-scale (<=480x270) stays allowed: recorded working on the v5e
    small = dataclasses.replace(settings, render_width=480, render_height=270)
    eng_mod.Engine(small)  # must not raise (host-side setup only)
    # explicit override re-enables the path at any scale
    monkeypatch.setenv("RTRT_ALLOW_WAVEFRONT", "1")
    eng_mod.Engine(settings)
