"""Engine: the public host runtime (init / render_frame / input / persist).

Counterpart of the reference's `RayTracer` host object
(reference: src/kernel.cuh:431-621 — init at src/init.cu:53, draw at
src/kernel.cu:259, input at src/inputControl.cu:29-150), re-shaped around
functional state: the Engine owns numpy/host state plus a jit-compiled frame
executable per resolution bucket and threads the device-side `FrameState`
through each call.

Includes:
  * dynamic resolution controller (bucketed static shapes; reference scales
    width continuously at kernel.cu:78-114 — we snap to precompiled buckets
    to avoid recompiles);
  * WASD+mouse fly camera and Ctrl+C/Ctrl+V-style camera save/load
    (reference: src/inputControl.cu:29-150, camera.bin -> camera.json);
  * sky regeneration only on parameter change (reference: kernel.cu:285-308).
"""

from __future__ import annotations

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def _tpu_available() -> bool:
    """Packet kernels need a real TPU backend (Pallas); CPU uses the XLA
    wavefront fallback."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False

from ..core.camera import Camera, make_camera
from ..denoise.pipeline import init_history
from ..post.exposure import init_exposure_state
from ..render.sky import (bake_sky_maps, finalize_sky_maps, make_sky_params,
                          sun_direction_from_time)
from ..render.texture import make_soil_textures
from ..utils.config import (FeatureFlags, GlobalSettings, RenderParams,
                            default_params)
from ..utils.timer import FpsLog, Timer
from .frame import FrameState, FrameStatic, make_frame_fn
from .scene import (HostScene, build_demo_scene, build_mesh_scene,
                    build_terrain_scene, padded_arrays)

_BUCKET_HEIGHTS = (270, 360, 540, 720, 1080, 1440, 2160)


def _bucket_for(height: int):
    for h in _BUCKET_HEIGHTS:
        if h >= height:
            return h
    return _BUCKET_HEIGHTS[-1]


def _res_for_height(h: int):
    """16:9, width snapped to a multiple of 16 (reference: kernel.cu:96-98)."""
    w = (h * 16 // 9) // 16 * 16
    return w, h


def packet_fit_mode(num_batches: int, sah_leaf8: bool = True) -> str:
    """How the scene's packed BVH tables fit the packet kernel's VMEM
    staging budget: "full" | "attr_hbm" | "none".

    The packet/megakernel paths stage the table set into VMEM scratch
    (bvh/packet.py: 64 B/record).  Past the budget (v5e: 128 MiB physical,
    ~114 MiB scoped, minus ray/output blocks) the ATTRIBUTE table can stay
    in HBM ("attr_hbm": the resolve loop DMAs single records on demand —
    only nodes+tris stage, raising the ceiling to ~1M tris, the reference
    envelope at src/kernel.cuh:54-55).  Beyond even that, scenes fall back
    to the XLA wavefront traverser ("none"): slower but unbounded.

    sah_leaf8: static/refit scenes use the flat SAH tree with row-aligned
    8-tri leaves + 4-wide collapse — its node table is ~24x smaller than
    the two-level LBVH worst case (T/8 leaves -> ~T/6 child slots ->
    ~T/24 nodes x 128 B)."""
    from ..bvh.types import BATCH_SIZE, BLAS_NODES
    tris = num_batches * BATCH_SIZE
    if sah_leaf8:
        # 512 B/node: 4-wide records padded to one 128-lane row each
        # (roll-free fetch, bvh/packet.py::pack_nodes4)
        nodes_mb = tris / 24 * 512 * 1.5 / 2**20  # 1.5x headroom
    else:
        nodes_mb = (2 * num_batches + num_batches * BLAS_NODES) * 64 / 2**20
    tris_mb = tris * 64 / 2**20
    attr_mb = tris * 64 / 2**20
    budget_mb = float(os.environ.get("RTRT_VMEM_TABLE_BUDGET_MB", "96"))
    if nodes_mb + tris_mb + attr_mb <= budget_mb:
        return "full"
    if nodes_mb + tris_mb <= budget_mb:
        return "attr_hbm"
    return "none"


def packet_tables_fit(num_batches: int) -> bool:
    """Back-compat predicate: True when the packet path can run at all
    (fully-staged tables OR the attr-in-HBM mode)."""
    sah8 = (os.environ.get("RTRT_SAH", "4") != "0"
            and os.environ.get("RTRT_LEAF_WIDTH", "8") != "1")
    return packet_fit_mode(num_batches, sah_leaf8=sah8) != "none"


class Engine:
    """Public API: `Engine(settings).render_frame() -> (H,W,3) uint8`."""

    def __init__(self, settings: GlobalSettings | None = None,
                 flags: FeatureFlags | None = None,
                 scene: HostScene | None = None,
                 params: RenderParams | None = None,
                 animation: str = "none"):
        self.settings = settings or GlobalSettings()
        self.flags = flags or FeatureFlags()
        self.params = params or default_params()
        self.animation = animation

        # ---- content (reference init.cu:82-97) ----
        if scene is not None:
            self.scene = scene
        elif self.settings.scene == "terrain":
            self.scene = build_terrain_scene(self.settings)
        elif self.settings.scene == "demo":
            self.scene = build_demo_scene()
        elif self.settings.scene.startswith("mesh:"):
            from ..content.meshio import load_mesh
            v, f = load_mesh(self.settings.scene[5:])
            self.scene = build_mesh_scene(v, f)
        else:
            raise ValueError(f"unknown scene '{self.settings.scene}'")

        pad = padded_arrays(self.scene)
        self.indices = jnp.asarray(pad["indices"])
        self.tri_mat = jnp.asarray(pad["tri_mat"])
        self.valid = jnp.asarray(pad["valid"])
        self.materials = self.scene.materials
        self.lights = getattr(self.scene, "lights", None)
        self.textures = make_soil_textures(self.settings.texture_size)
        self._ftex = None
        if self.flags.fourier_textures:
            # fit the image textures to the analytic Fourier basis once at
            # init (host lstsq) — the megakernel then shades textured
            # materials from real image-derived data with zero gathers
            from ..render.ftex import fit_soil_fourier
            self._ftex = fit_soil_fourier(self.textures)

        # ---- sky (regenerated on param change) ----
        self._sky_key = None
        self._bake_sky = jax.jit(bake_sky_maps, static_argnames=("model",))
        self.sky = None
        self._maybe_regen_sky()

        # ---- camera ----
        self.camera = make_camera(pos=(0.0, 8.0, -18.0), yaw=0.0, pitch=-0.25,
                                  fov_y=1.1)
        self.prev_camera = self.camera
        if self.settings.load_camera_at_init and \
                os.path.exists(self.settings.camera_path):
            self.load_camera(self.settings.camera_path)

        # ---- device frame state ----
        self.state = FrameState(
            vertices=jnp.asarray(self.scene.vertices),
            normals=jnp.asarray(self.scene.normals),
            history=init_history(1, 1, half=self.flags.half_history),  # re-inited per bucket below
            exposure=init_exposure_state(),
            frame_idx=jnp.uint32(0),
            time=jnp.float32(0.0),
        )

        # ---- static scenes: build the BVH + sorted tri tables ONCE ----
        # (the per-frame in-jit rebuild stays the path for animated
        # geometry; the reference rebuilds unconditionally, kernel.cu:328)
        self.prebuilt = None
        self._refit_plan = None
        refit_ok = (
            self.animation == "wave"
            and os.environ.get("RTRT_REFIT", "1") != "0"
            and os.environ.get("RTRT_SAH", "4") == "4"
            and os.environ.get("RTRT_MEGAKERNEL", "1") != "0"
            and _tpu_available() and packet_tables_fit(self.scene.num_batches))
        if refit_ok:
            # animated scenes: freeze the init-time SAH/BVH4 topology and
            # refit boxes per frame inside the jitted program (bvh/refit.py)
            from ..bvh.refit import plan_refit4
            from ..bvh.sah import build_scene_tables_sah, bvh4_nodes
            self._sah_leaf = int(os.environ.get("RTRT_LEAF_WIDTH", "8"))
            bvh, nrm_t, mat_s = build_scene_tables_sah(
                self.scene.num_batches, self.indices, self.tri_mat,
                self.valid, self.state.vertices, self.state.normals,
                leaf_max=self._sah_leaf)
            raw4 = bvh4_nodes(bvh)
            self._node_pad = self._node_pad_fits(raw4.shape[0], bvh)
            self._refit_plan = plan_refit4(raw4, leaf_width=self._sah_leaf)
            self.prebuilt = (bvh, nrm_t, mat_s)
        elif self.animation == "none" and \
                os.environ.get("RTRT_PREBUILD", "1") != "0":
            if os.environ.get("RTRT_SAH", "4") != "0":
                # static scenes get the high-quality binned-SAH flat tree
                # (host/native build, init-time only — bvh/sah.py): ~1.5-2x
                # fewer node visits/ray than the per-frame morton LBVH
                from ..bvh.sah import build_scene_tables_sah, bvh4_nodes
                # row-aligned 8-tri leaves: one packet-kernel row fetch
                # tests a whole leaf, and the tree shrinks ~6x
                self._sah_leaf = int(os.environ.get("RTRT_LEAF_WIDTH", "8"))
                bvh, nrm_t, mat_s = build_scene_tables_sah(
                    self.scene.num_batches, self.indices, self.tri_mat,
                    self.valid, self.state.vertices, self.state.normals,
                    leaf_max=self._sah_leaf)
                nodes4 = None
                if os.environ.get("RTRT_SAH", "4") == "4":
                    # 4-wide collapse: one record fetch serves two binary
                    # levels — halves packet-traversal steps.  Row-padded
                    # (roll-free fetch) when nodes+tris still fit the
                    # staging budget; dense rolled layout otherwise
                    # (the ~1M-tri envelope)
                    from ..bvh.packet import pack_nodes4
                    raw4 = bvh4_nodes(bvh)
                    self._node_pad = self._node_pad_fits(raw4.shape[0], bvh)
                    nodes4 = pack_nodes4(raw4, pad=self._node_pad)
                self.prebuilt = (bvh, nrm_t, mat_s, nodes4)
            else:
                from .frame import build_scene_tables
                build = jax.jit(build_scene_tables, static_argnums=0)
                self.prebuilt = jax.block_until_ready(build(
                    self.scene.num_batches, self.indices, self.tri_mat,
                    self.valid, self.state.vertices, self.state.normals))

        # ---- resolution buckets ----
        self._frame_fns = {}
        self._precompiling = set()
        self._cur_bucket = None
        self.render_w = self.render_h = 0
        self._set_bucket(_bucket_for(self.settings.render_height))
        if self.settings.dynamic_resolution.enabled:
            self._precompile_neighbors()

        self.timer = Timer()
        self.fps_log = FpsLog()
        self._input = dict(keys=set(), last_cursor=None)

    # ------------------------------------------------------------------
    # resolution buckets / dynamic resolution
    # ------------------------------------------------------------------

    def _node_pad_fits(self, q: int, bvh) -> bool:
        """Row-padded 4-wide nodes (512 B/node, roll-free fetch) only when
        padded nodes + packed tris still fit the VMEM staging budget —
        otherwise the dense rolled layout keeps the big-scene envelope on
        the packet path (r3 parity: 1M tris via attr_hbm)."""
        if "dense_nodes" in os.environ.get("RTRT_SURGERY", ""):
            return False
        from ..bvh.packet import packed_rows
        nodes_b = (-(-q // 8) * 8) * 128 * 4
        tris_b = packed_rows(int(bvh.tris_t.shape[1]), 16) * 128 * 4
        budget = float(os.environ.get("RTRT_VMEM_TABLE_BUDGET_MB",
                                      "96")) * 2**20
        return nodes_b + tris_b <= budget

    def _actual_fit_mode(self):
        """Fit mode from the REAL packed-table byte sizes (ADVICE r3: the
        tris/24*1.5 analytic estimate under-counts when SAH leaves fill
        poorly — up to ~5x for 1-tri leaves — and a wrong 'full' pick fails
        Pallas staging at render time instead of falling back).  Only
        available once the prebuilt tables exist; returns None otherwise
        (the in-frame LBVH rebuild path has exact deterministic sizes the
        estimate already covers)."""
        if self.prebuilt is None:
            return None
        from ..bvh.packet import packed_rows
        bvh = self.prebuilt[0]
        row_b = 128 * 4
        tris_b = attr_b = packed_rows(int(bvh.tris_t.shape[1]), 16) * row_b
        nodes4 = self.prebuilt[3] if len(self.prebuilt) > 3 else None
        if nodes4 is not None:
            nodes_b = int(nodes4.size) * 4
        elif self._refit_plan is not None:
            q = self._refit_plan.q
            nodes_b = ((-(-q // 8) * 8) * row_b
                       if getattr(self, "_node_pad", True)
                       else packed_rows(q, 32) * row_b)
        else:
            nodes_b = packed_rows(int(bvh.boxes_t.shape[1]), 16) * row_b
        budget = float(os.environ.get("RTRT_VMEM_TABLE_BUDGET_MB",
                                      "96")) * 2**20
        # padded attr table (row-per-record, x8): roll-free resolve fetch
        attr_pad_b = int(bvh.tris_t.shape[1]) * 128 * 4
        if nodes_b + tris_b + attr_pad_b <= budget \
                and "dense_attrs" not in os.environ.get("RTRT_SURGERY", ""):
            return "full_pad"
        if nodes_b + tris_b + attr_b <= budget:
            return "full"
        if nodes_b + tris_b <= budget:
            return "attr_hbm"
        return "none"

    def _static_for(self, bucket_h: int) -> FrameStatic:
        w, h = _res_for_height(bucket_h)
        sah8 = (os.environ.get("RTRT_SAH", "4") != "0"
                and os.environ.get("RTRT_LEAF_WIDTH", "8") != "1")
        # prebuilt tables exist -> decide from their actual packed sizes;
        # otherwise the analytic estimate (exact for the in-frame LBVH,
        # which is what runs when there is no prebuilt)
        fit_mode = self._actual_fit_mode() if self.prebuilt is not None \
            else packet_fit_mode(self.scene.num_batches, sah_leaf8=False)
        packets_fit = fit_mode != "none"
        # Envelope fence: beyond the packet paths (~1.4M tris) the XLA
        # wavefront fallback is the only TPU route, and at product
        # resolutions its gather-heavy while_loops run minutes per frame
        # and die with a device-side "TPU kernel fault" on the v5e
        # (recorded round 4; it works at demo scale — 480x270 = 18.6 ms).
        # Rather than silently reaching a faulting path, refuse the
        # config with a clear error.  RTRT_ALLOW_WAVEFRONT=1 opts back in
        # (small scenes / experiments); the CPU backend is unaffected.
        if (_tpu_available() and not packets_fit and w * h > 480 * 270
                and os.environ.get("RTRT_ALLOW_WAVEFRONT") != "1"):
            raise RuntimeError(
                f"scene ({self.scene.num_batches * 1024} padded tris) "
                f"exceeds the packet-traversal VMEM envelope and the XLA "
                f"wavefront fallback is not supported on TPU above "
                f"480x270 (device-fault at scale; see PARITY.md envelope "
                f"table).  Reduce resolution, raise "
                f"RTRT_VMEM_TABLE_BUDGET_MB, or set RTRT_ALLOW_WAVEFRONT=1 "
                f"to override.")
        b = self.scene.num_batches
        flags = self.flags
        return FrameStatic(
            render_w=w, render_h=h,
            screen_w=self.settings.render_width,
            screen_h=self.settings.render_height,
            num_batches=b,
            flags=flags,
            use_packets=_tpu_available() and packets_fit,
            use_megakernel=(_tpu_available() and packets_fit
                            and os.environ.get("RTRT_MEGAKERNEL", "1") != "0"),
            # bounce segments traverse in 32-row strips: incoherent rays
            # make a (64,128) tile's step union approach the sum of
            # per-lane visits, so half-height strips do ~sqrt(2)x the
            # steps at half the vector work each.  Swept on terrain 1080p
            # after the merged-lane-reduce change cut the per-step fixed
            # cost: 0 -> 172.1 ms, 8 -> 164.7, 16 -> 150.5, 32 -> 149.6.
            bounce_subtile=int(os.environ.get("RTRT_BOUNCE_SUBTILE", "32")),
            attr_hbm=(fit_mode == "attr_hbm"),
            attr_pad=(fit_mode == "full_pad"),
            node_pad=getattr(self, "_node_pad", True),
            sah_leaf=getattr(self, "_sah_leaf", 1),
            ftex=getattr(self, "_ftex", None),
            animation=self.animation,
            # interlaced sparse rendering: trace half the pixel rows per
            # frame (alternating parity), reconstruct full-res before the
            # denoiser — ~1.7x frame-rate at product resolution (measured
            # r5, ROADMAP).  Settings field or RTRT_INTERLACE=1/0 override.
            interlace=(os.environ.get(
                "RTRT_INTERLACE",
                "1" if getattr(self.settings, "interlace", False) else "0")
                == "1" and h % 2 == 0))

    def _set_bucket(self, bucket_h: int):
        if bucket_h == self._cur_bucket:
            return
        self._cur_bucket = bucket_h
        self.render_w, self.render_h = _res_for_height(bucket_h)
        static = self._static_for(bucket_h)
        self._static = static
        if bucket_h not in self._frame_fns:
            self._frame_fns[bucket_h] = make_frame_fn(
                static, refit_plan=self._refit_plan)
        # history buffers are resolution-dependent — reset on switch
        self.state = self.state._replace(
            history=init_history(self.render_h, self.render_w,
                                 half=self.flags.half_history))

    def _precompile_bucket_async(self, bucket_h: int):
        """Warm one bucket's frame executable in a daemon thread (compile +
        one throwaway execution, so the switch reuses a hot jit cache).

        The reference re-allocates continuously-sized buffers on resolution
        change (kernel.cu:78-114) — free on CUDA, but each static-shape
        bucket here is a fresh XLA compile (minutes cold at 1080p).  Without
        warming, the first frame after a dynamic-resolution switch hitches
        for the whole compile."""
        if (bucket_h in self._frame_fns or bucket_h in self._precompiling
                or os.environ.get("RTRT_PRECOMPILE", "1") == "0"):
            return
        import threading
        self._precompiling.add(bucket_h)
        static = self._static_for(bucket_h)
        fn = make_frame_fn(static, refit_plan=self._refit_plan)

        def work():
            try:
                state = self.state._replace(history=init_history(
                    static.render_h, static.render_w,
                    half=self.flags.half_history))
                args = (self.indices, self.tri_mat, self.valid,
                        self.materials, self.textures, self.sky, self.lights,
                        state, self.camera, self.camera, self.params,
                        jnp.float32(1 / 60), self.prebuilt)
                jax.block_until_ready(fn(*args))
                self._frame_fns[bucket_h] = fn
            except Exception:
                pass  # precompile is best-effort; the switch still works
            finally:
                self._precompiling.discard(bucket_h)

        threading.Thread(target=work, daemon=True,
                         name=f"rtrt-precompile-{bucket_h}").start()

    def _precompile_neighbors(self):
        """Kick background warms for the buckets one step down and up."""
        idx = _BUCKET_HEIGHTS.index(self._cur_bucket)
        for j in (idx - 1, idx + 1):
            if 0 <= j < len(_BUCKET_HEIGHTS) and \
                    _BUCKET_HEIGHTS[j] <= max(self.settings.render_height,
                                              _BUCKET_HEIGHTS[0]):
                self._precompile_bucket_async(_BUCKET_HEIGHTS[j])

    def _dynamic_resolution_step(self, frame_time: float):
        """Scale the bucket to hold the target frame time
        (reference controller: kernel.cu:78-114, here bucket-snapped)."""
        dr = self.settings.dynamic_resolution
        if not dr.enabled or frame_time <= 0.0:
            return
        fps = 1.0 / frame_time
        idx = _BUCKET_HEIGHTS.index(self._cur_bucket)
        if fps < dr.target_fps - dr.deadband_fps and idx > 0:
            self._set_bucket(_BUCKET_HEIGHTS[idx - 1])
            self._precompile_neighbors()
        elif fps > dr.target_fps + dr.deadband_fps * 4 and \
                idx < len(_BUCKET_HEIGHTS) - 1:
            nh = _BUCKET_HEIGHTS[idx + 1]
            if nh <= self.settings.render_height:
                self._set_bucket(nh)
                self._precompile_neighbors()

    # ------------------------------------------------------------------
    # sky regeneration (reference: kernel.cu:285-308)
    # ------------------------------------------------------------------

    def _maybe_regen_sky(self):
        sp = self.params.sky
        key = tuple(float(x) for x in (sp.time_of_day, sp.sun_axis_angle,
                                       sp.sun_intensity, sp.rayleigh, sp.mie,
                                       sp.mie_g))
        if key == self._sky_key:
            return
        self._sky_key = key
        sun = sun_direction_from_time(sp.time_of_day, float(sp.sun_axis_angle))
        elev = math.asin(max(-1.0, min(1.0, float(sun[1]))))
        azim = math.atan2(float(sun[0]), float(sun[2]))
        sky_params = make_sky_params(
            sun_elevation=elev, sun_azimuth=azim,
            sun_intensity=float(sp.sun_intensity),
            rayleigh_scale=float(sp.rayleigh), mie_scale=float(sp.mie),
            mie_g=float(sp.mie_g))
        self.sky = finalize_sky_maps(self._bake_sky(
            sky_params, model=self.settings.sky_model))

    # ------------------------------------------------------------------
    # per-frame
    # ------------------------------------------------------------------

    def render_frame_device(self, dt: float | None = None):
        """Render one frame; returns the (screen_h, screen_w, 3) uint8 image
        as a DEVICE array (synced).  Use this for benchmarking / chaining —
        the host copy is a separate (and on dev tunnels, slow) step."""
        if dt is None:
            dt = self.timer.update()
        self._update_camera_from_input(dt)
        self._maybe_regen_sky()

        fn = self._frame_fns[self._cur_bucket]
        image, new_state = fn(*self._frame_args(dt))
        self.state = new_state
        self.prev_camera = self.camera
        self._dynamic_resolution_step(dt)
        self.fps_log.maybe_log(self.timer.fps, self.render_w, self.render_h)
        image.block_until_ready()
        return image

    def render_frame(self, dt: float | None = None) -> np.ndarray:
        """Render one frame; returns (screen_h, screen_w, 3) uint8 on host."""
        return np.asarray(self.render_frame_device(dt))

    def _frame_args(self, dt: float):
        """The positional argument tuple for the current frame function
        (also consumed by tools/profile_frame.py's stage cuts)."""
        return (self.indices, self.tri_mat, self.valid, self.materials,
                self.textures, self.sky, self.lights, self.state,
                self.camera, self.prev_camera, self.params,
                jnp.float32(max(dt, 1e-4)), self.prebuilt)

    # ------------------------------------------------------------------
    # input control (reference: src/inputControl.cu:29-113)
    # ------------------------------------------------------------------

    MOVE_SPEED = 8.0
    LOOK_SPEED = 0.003

    def key_event(self, key: str, down: bool):
        key = key.lower()
        if down:
            self._input["keys"].add(key)
        else:
            self._input["keys"].discard(key)

    def cursor_event(self, x: float, y: float):
        last = self._input["last_cursor"]
        self._input["last_cursor"] = (x, y)
        if last is None:
            return
        dx, dy = x - last[0], y - last[1]
        self.camera = self.camera._replace(
            yaw=self.camera.yaw + dx * self.LOOK_SPEED,
            pitch=float(np.clip(self.camera.pitch - dy * self.LOOK_SPEED,
                                -1.5, 1.5)))

    def _update_camera_from_input(self, dt: float):
        keys = self._input["keys"]
        if not keys:
            return
        cy, sy = math.cos(float(self.camera.yaw)), math.sin(float(self.camera.yaw))
        fwd = np.array([sy, 0.0, cy])
        right = np.array([cy, 0.0, -sy])
        move = np.zeros(3)
        if "w" in keys:
            move += fwd
        if "s" in keys:
            move -= fwd
        if "d" in keys:
            move += right
        if "a" in keys:
            move -= right
        if "c" in keys:
            move += np.array([0.0, 1.0, 0.0])
        if "x" in keys:
            move -= np.array([0.0, 1.0, 0.0])
        if np.any(move):
            pos = np.asarray(self.camera.pos) + move * (self.MOVE_SPEED * dt)
            self.camera = self.camera._replace(pos=jnp.asarray(pos, jnp.float32))

    # ------------------------------------------------------------------
    # camera persistence (reference: inputControl.cu:115-150, camera.bin)
    # ------------------------------------------------------------------

    def save_camera(self, path: str | None = None):
        path = path or self.settings.camera_path
        c = self.camera
        data = dict(pos=[float(x) for x in np.asarray(c.pos)],
                    yaw=float(c.yaw), pitch=float(c.pitch),
                    fov_y=float(c.fov_y), aperture=float(c.aperture),
                    focal_dist=float(c.focal_dist))
        with open(path, "w") as f:
            json.dump(data, f, indent=2)

    def load_camera(self, path: str | None = None):
        path = path or self.settings.camera_path
        with open(path) as f:
            d = json.load(f)
        self.camera = make_camera(pos=tuple(d["pos"]), yaw=d["yaw"],
                                  pitch=d["pitch"], fov_y=d["fov_y"],
                                  aperture=d["aperture"],
                                  focal_dist=d["focal_dist"])

    # ------------------------------------------------------------------
    # full-state checkpoint / resume (SURVEY.md §5.4: camera + history
    # buffers for deterministic replay)
    # ------------------------------------------------------------------

    def save_state(self, path: str):
        """Snapshot the device frame state (history buffers, exposure,
        frame counter, vertices) + camera to an npz checkpoint."""
        import jax
        flat, _ = jax.tree_util.tree_flatten(self.state)
        arrays = {f"s{i}": np.asarray(x) for i, x in enumerate(flat)}
        c = self.camera
        arrays["camera"] = np.concatenate(
            [np.asarray(c.pos),
             np.asarray([float(c.yaw), float(c.pitch), float(c.fov_y),
                         float(c.aperture), float(c.focal_dist)])])
        np.savez_compressed(path, **arrays)

    def load_state(self, path: str):
        import jax
        d = np.load(path)
        flat, treedef = jax.tree_util.tree_flatten(self.state)
        new_flat = [jnp.asarray(d[f"s{i}"]) for i in range(len(flat))]
        self.state = jax.tree_util.tree_unflatten(treedef, new_flat)
        cam = d["camera"]
        self.camera = make_camera(pos=tuple(cam[:3]), yaw=float(cam[3]),
                                  pitch=float(cam[4]), fov_y=float(cam[5]),
                                  aperture=float(cam[6]),
                                  focal_dist=float(cam[7]))
        self.prev_camera = self.camera
