"""The fused per-frame program: BVH rebuild -> path trace -> denoise -> post.

Counterpart of the reference's RayTracer::draw
(reference: src/kernel.cu:259-398) with one architectural difference that IS
the TPU design: the reference serializes ~30 kernel launches with a
cudaDeviceSynchronize between every stage (kernel.cu:282-396); here the
ENTIRE frame — two-level LBVH rebuild, wavefront path trace, SVGF chain,
postprocess, quantize — is a single jitted XLA program.  No host round
trips, no per-stage sync, full compiler fusion across stage boundaries.

`make_frame_fn` closes over the static scene shape/flags and returns a
jit-compiled callable; dynamic resolution buckets each get their own
compiled executable (reference: dynamic resolution at kernel.cu:78-114;
static-shape strategy per SURVEY.md §7 stage 4).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bvh.build import build_scene_bvh
from ..bvh.types import BATCH_SIZE
from ..core.camera import Camera, camera_basis, world_to_screen
from ..denoise.pipeline import DenoiseHistory, denoise
from ..ops.reduce import segment_sum
from ..post.pipeline import postprocess
from ..render.integrator import GBuffer, SceneData, path_trace
from ..render.raygen import generate_rays_padded, pixel_grid
from ..render.sampling import rand2
from ..render.sky import SkyMaps
from ..utils.config import FeatureFlags, RenderParams


class FrameState(NamedTuple):
    """Mutable (functionally-threaded) per-frame state."""

    vertices: jnp.ndarray      # (V,3)
    normals: jnp.ndarray       # (V,3)
    history: DenoiseHistory
    exposure: jnp.ndarray      # (4,)
    frame_idx: jnp.ndarray     # () uint32
    time: jnp.ndarray = None   # () f32 accumulated animation time


def displace_wave(vertices, time, amp=0.35, freq=0.5, speed=1.5):
    """In-jit vertex displacement: traveling waves along y — the analog of
    the reference's MeshDisplace hook (src/kernel.cu:139-217).  Runs every
    frame; the two-level LBVH rebuild absorbs the animated geometry."""
    x = vertices[:, 0]
    z = vertices[:, 2]
    dy = amp * jnp.sin(freq * x + time * speed) \
        * jnp.cos(freq * 0.8 * z + time * 1.1)
    return vertices.at[:, 1].add(dy)


def displace_wave_rows(tris_t, time, amp=0.35, freq=0.5, speed=1.5):
    """The same traveling wave applied directly to the SORTED (9, P)
    triangle table (rows 0-2/3-5/6-8 = v0/v1/v2).  The displacement is a
    pure function of (x, z), so per-slot application needs ZERO gathers —
    duplicate slots (row-aligned leaf padding) displace identically."""
    out = tris_t
    for b in (0, 3, 6):
        x = tris_t[b]
        z = tris_t[b + 2]
        dy = amp * jnp.sin(freq * x + time * speed) \
            * jnp.cos(freq * 0.8 * z + time * 1.1)
        out = out.at[b + 1].add(dy)
    return out


def wave_normal_rows(nrm_t, tris_t, time, amp=0.35, freq=0.5, speed=1.5):
    """EXACT shading-normal transform under p' = p + d(x,z)·ŷ.

    The displacement Jacobian is J = I + ŷ∇dᵀ with det J = 1, so normals
    map by the inverse-transpose: n' = n - ∇d·n_y, i.e.
        n'_x = n_x - ∂d/∂x · n_y,   n'_z = n_z - ∂d/∂z · n_y.
    Analytic, per-row, zero gathers — replacing the segment-sum smooth-
    normal recompute the reference does after MeshDisplace
    (src/kernel.cu:313-327), and exact where that is an average.
    nrm_t/tris_t: (9, P) sorted rows (undisplaced positions)."""
    out = []
    for b in (0, 3, 6):
        x = tris_t[b]
        z = tris_t[b + 2]
        pa = freq * x + time * speed
        pb = freq * 0.8 * z + time * 1.1
        ddx = amp * freq * jnp.cos(pa) * jnp.cos(pb)
        ddz = -amp * freq * 0.8 * jnp.sin(pa) * jnp.sin(pb)
        ny = nrm_t[b + 1]
        nx = nrm_t[b] - ddx * ny
        nz = nrm_t[b + 2] - ddz * ny
        il = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
        out += [nx * il, ny * il, nz * il]
    return jnp.stack(out)


def interleave_rows(a, b):
    """Row-interleave two (h2, w, ...) arrays into (2*h2, w, ...):
    out[0::2] = a, out[1::2] = b.

    Lowered as two interior-padded `lax.pad` ops + add — a form XLA keeps
    in the image's native layout (a (h/2, 2, w) stack/reshape would
    propagate hostile tiling through the denoise chain, ROADMAP fact #6).
    Works for float and integer planes (pad value 0, disjoint rows)."""
    zero = jnp.zeros((), a.dtype)
    ca = [(0, 1, 1)] + [(0, 0, 0)] * (a.ndim - 1)
    cb = [(1, 0, 1)] + [(0, 0, 0)] * (a.ndim - 1)
    return jax.lax.pad(a, zero, ca) + jax.lax.pad(b, zero, cb)


class FrameStatic(NamedTuple):
    """Static (hashable) frame configuration — part of the jit key."""

    render_w: int
    render_h: int
    screen_w: int
    screen_h: int
    num_batches: int
    flags: FeatureFlags
    max_traversal_steps: int = 1024
    use_packets: bool = True  # Pallas packet kernel (TPU); False = XLA loop
    use_megakernel: bool = False  # whole bounce program in ONE Pallas kernel
    bounce_subtile: int = 0   # >0: bounce segments traverse in strips this
    #   many pixel rows high (megakernel only) — cuts the per-step dense
    #   work on direction-incoherent bounce rays; 0 = whole-tile unions
    pallas_interpret: bool = False  # run Pallas kernels in interpret mode
    #   (CPU validation of kernel paths, e.g. the sharded megakernel test)
    pallas_aux: bool = True   # Pallas denoise/post auxiliary kernels
    #   (tile-shift reprojection, windowed wide filters).  False routes
    #   those stages through their parity-tested XLA twins while keeping
    #   the native megakernel — used where the frame must compile under
    #   the DEFAULT 16 MiB scoped-VMEM limit (a bare jax.jit without the
    #   engine's raised xla_tpu_scoped_vmem_limit_kib, e.g. the driver's
    #   __graft_entry__ compile check)
    node_pad: bool = True     # 4-wide node table row-per-record (x4 VMEM,
    #   roll-free fetch); False = dense rolled layout for scenes where the
    #   padded table would blow the staging budget (~1M-tri envelope)
    attr_pad: bool = False    # attr table row-per-record (x8 VMEM): the
    #   resolve loop's record fetch is roll-free (engine picks this when
    #   the padded table fits the staging budget — small/mid scenes)
    attr_hbm: bool = False    # megakernel: leave the attribute table in HBM
    #   (resolve-loop record DMAs) — halves the VMEM staging budget so
    #   ~1M-tri scenes ride the packet path (engine.packet_fit_mode)
    sah_leaf: int = 1         # leaf width of the prebuilt flat SAH tree
    #   (8 = row-aligned multi-tri leaves, bvh/sah.py::_collapse_leaves);
    #   only consulted when the static-scene prebuilt tables are in use
    ftex: tuple = None        # render/ftex.FourierTextures — fitted
    #   image-texture set for the megakernel's textured materials.  Nested
    #   float tuples (hashable): every coefficient folds into the compiled
    #   kernel as an immediate; a texture refit recompiles the frame, like
    #   the reference's init-time texture load (src/init.cu:524-580)
    animation: str = "none"   # none | wave — in-jit vertex displacement
    interlace: bool = False   # interlaced sparse rendering (megakernel
    #   only): each frame traces HALF the pixel rows (y = 2i + frame
    #   parity), the reconstruction interleaves traced rows with
    #   vertical-neighbor fills, and the temporal accumulator — which
    #   already integrates jittered 1-spp samples across frames — sees
    #   every row at full rate over any 2-frame window.  The TPU-native
    #   form of the reference's resolution/perf trade (its dynamic
    #   resolution, src/kernel.cu:78-114): trace cost ~halves while the
    #   OUTPUT grid (G-buffer, history, denoise, post) stays full-res,
    #   so static detail converges to the full-rate image instead of
    #   being upscaled away
    stop_after: str = "full"  # full | bvh | trace | denoise — profiling
    #   harness cut points: the frame program ends after the named stage so
    #   stage cost = t(stage_k) - t(stage_{k-1}).  The reference gets this
    #   for free from its per-stage cudaDeviceSynchronize
    #   (src/kernel.cu:282-396); the fused XLA frame needs deliberate cuts.


def compute_smooth_normals(vertices, indices):
    """Area-weighted vertex normals via segment_sum — the atomic-free analog
    of the reference's GenerateSmoothNormals (src/kernel.cu:228-257)."""
    v0 = vertices[indices[:, 0]]
    v1 = vertices[indices[:, 1]]
    v2 = vertices[indices[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted
    nv = vertices.shape[0]
    acc = (segment_sum(fn, indices[:, 0], nv)
           + segment_sum(fn, indices[:, 1], nv)
           + segment_sum(fn, indices[:, 2], nv))
    norm = jnp.linalg.norm(acc, axis=-1, keepdims=True)
    return acc / jnp.maximum(norm, 1e-12)


def build_scene_tables(num_batches: int, indices, tri_mat, valid, verts, nrm):
    """Two-level LBVH rebuild + sorted per-triangle attribute prep
    (the bvh.cu:7-97 analog).  Returns (bvh, tri_nrm_t, sorted_mat).

    Called per frame for animated geometry; for static scenes the Engine
    runs it ONCE at init and feeds the result into `render_frame` via
    `prebuilt` — the reference rebuilds unconditionally every frame
    (src/kernel.cu:328-333) even though its scene is static, which is
    ~50 ms/frame of pure waste at terrain scale on TPU.
    """
    b = num_batches
    tv0 = verts[indices[:, 0]].reshape(b, BATCH_SIZE, 3)
    tv1 = verts[indices[:, 1]].reshape(b, BATCH_SIZE, 3)
    tv2 = verts[indices[:, 2]].reshape(b, BATCH_SIZE, 3)
    bvh = build_scene_bvh(tv0, tv1, tv2, valid)

    # per-triangle attributes in sorted leaf order, packed wide.  The
    # batch-local permutation (indices + material id) goes through the
    # one-hot MXU gather; the global vertex-normal fetch stays an XLA
    # gather (vertex index space is too wide to one-hot).
    from ..ops.gather import onehot_permute
    sort_idx = bvh.sorted_tri_index
    reorder = (sort_idx.reshape(b, BATCH_SIZE)
               - (jnp.arange(b, dtype=jnp.int32) * BATCH_SIZE)[:, None])
    perm = onehot_permute(
        jnp.concatenate([indices.reshape(b, BATCH_SIZE, 3),
                         tri_mat.reshape(b, BATCH_SIZE, 1)], axis=-1),
        reorder)
    flat_idx = perm[..., 0:3].reshape(-1, 3)
    sorted_mat = perm[..., 3].reshape(-1)
    tri_nrm_t = jnp.concatenate(
        [nrm[flat_idx[:, 0]].T, nrm[flat_idx[:, 1]].T,
         nrm[flat_idx[:, 2]].T], axis=0)  # (9, T) column-major
    return bvh, tri_nrm_t, sorted_mat


def render_frame(static: FrameStatic, indices, tri_mat, valid, materials,
                 textures, sky: SkyMaps, lights, state: FrameState,
                 camera: Camera, prev_camera: Camera, params: RenderParams,
                 dt, prebuilt=None, row_sharding=None, trace_mesh=None,
                 refit_plan=None):
    """One full frame.  Returns (u8 image (screen_h, screen_w, 3), new state).

    indices/tri_mat/valid: padded static scene arrays (engine/scene.py);
    materials/textures: static tables; sky: baked maps.

    prebuilt: optional (bvh, tri_nrm_t, sorted_mat) from
    `build_scene_tables` — skips the in-frame LBVH rebuild for static
    scenes (only honored when static.animation == "none").

    row_sharding: optional callable applying a row-axis sharding constraint
    to an (H, W, ...) image array (parallel/frame_spmd.py).  When set, the
    G-buffer, denoised frame and history are pinned to the mesh's row
    shards and XLA's SPMD partitioner propagates the sharding through the
    WHOLE frame program — trace runs shard-local, denoise stencils get
    automatic halo exchanges, the exposure histogram becomes an
    all-reduce.  This is the multi-chip path for the real product frame
    (not a reduced pipeline).
    """
    w, h = static.render_w, static.render_h
    sw, sh = static.screen_w, static.screen_h
    b = static.num_batches
    frame_idx = state.frame_idx

    # ---- geometry gather + two-level LBVH rebuild (bvh.cu:7-97 analog) ----
    nodes4 = None
    leaf_width = 1
    if prebuilt is not None and static.animation == "none":
        leaf_width = static.sah_leaf
        bvh, tri_nrm_t, sorted_mat = prebuilt[:3]
        if len(prebuilt) > 3:
            nodes4 = prebuilt[3]  # packed 4-wide SAH table (or None)
    elif prebuilt is not None and refit_plan is not None \
            and static.animation == "wave":
        # animated REFIT path (bvh/refit.py): displace the sorted triangle
        # rows + shading normals analytically (zero gathers), recompute
        # leaf AABBs with a reshape-reduce, and level-synchronously refit
        # the frozen 4-wide SAH topology — SAH tree quality for dynamic
        # geometry at a tiny fraction of a full rebuild.  The reference
        # rebuilds its (worse) morton tree from scratch every frame
        # (src/bvh.cu:7-97); refit is the TPU-native equivalent capability.
        from ..bvh.packet import pack_nodes4
        from ..bvh.refit import leaf_bounds, refit_nodes4
        leaf_width = static.sah_leaf
        bvh0, nrm_t0, sorted_mat = prebuilt[:3]
        t_now = (state.time if state.time is not None
                 else state.frame_idx.astype(jnp.float32) * dt)
        tt = displace_wave_rows(bvh0.tris_t, t_now)
        tri_nrm_t = wave_normal_rows(nrm_t0, bvh0.tris_t, t_now)
        llo, lhi = leaf_bounds(tt, refit_plan.n_leaves, refit_plan.leaf_width)
        nodes4 = pack_nodes4(refit_nodes4(refit_plan, llo, lhi),
                             pad=static.node_pad)
        bvh = bvh0._replace(tris_t=tt)
    else:
        verts = state.vertices
        nrm = state.normals
        if static.animation == "wave":
            t_now = (state.time if state.time is not None
                     else state.frame_idx.astype(jnp.float32) * dt)
            verts = displace_wave(verts, t_now)
            # re-derive smooth normals for the displaced surface
            # (reference recomputes after MeshDisplace, kernel.cu:313-327)
            nrm = compute_smooth_normals(verts, indices)
        bvh, tri_nrm_t, sorted_mat = build_scene_tables(
            b, indices, tri_mat, valid, verts, nrm)
    if static.stop_after == "bvh":
        return (bvh.boxes_t, bvh.children_t, bvh.tris_t, tri_nrm_t), state
    scene = SceneData(
        bvh=bvh,
        tri_nrm_t=tri_nrm_t,
        tri_mat=sorted_mat,
        materials=materials,
        sky=sky,
        textures=textures,
        lights=lights,
        nodes4=nodes4,
    )

    # ---- raygen (1 spp), padded once to the packet tile multiple ----
    # (padding per traversal call costs an async copy of the whole ray
    # buffer; padding a few dummy rays here is free)
    cam = camera._replace(aperture=params.sample.aperture,
                          focal_dist=params.sample.focal_dist)
    basis = camera_basis(cam)
    prev_basis = camera_basis(prev_camera)
    import numpy as _np
    from ..bvh.packet import TILE, TILE_SHAPE
    n_pix = w * h
    interlace = static.interlace and static.use_megakernel and h % 2 == 0
    parity = (frame_idx & jnp.uint32(1)).astype(jnp.int32)
    if static.use_megakernel:
        # IMAGE-NATIVE route: rays, blue-noise offsets and G-buffer all stay
        # (hp, wp) images; the megakernel's 2D grid + BlockSpecs handle the
        # (64,128)-pixel-block tiling — zero host-side permutes/relayouts
        th, tw = TILE_SHAPE
        ht = h // 2 if interlace else h   # traced pixel rows this frame
        hp = -(-ht // th) * th
        wp = -(-w // tw) * tw
        if interlace:
            # interlaced: row i of the traced grid is image row 2i+parity.
            # pixel_ids is kernel DATA (seeds + uv derive from it), so the
            # traced parity costs nothing — one compiled program serves
            # both fields
            yy = jnp.minimum(
                jnp.arange(hp, dtype=jnp.int32) * 2 + parity, h - 1)
        else:
            yy = jnp.minimum(jnp.arange(hp, dtype=jnp.int32), h - 1)
        xx = jnp.minimum(jnp.arange(wp, dtype=jnp.int32), w - 1)
        pixel_ids = yy[:, None] * w + xx[None, :]       # (hp, wp)
    else:
        hp = wp = None
        n_pad = -(-n_pix // TILE) * TILE
        pixel_ids = jnp.minimum(jnp.arange(n_pad, dtype=jnp.int32),
                                n_pix - 1)
    # inter-pixel blue-noise sample distribution: per-pixel CP offsets from
    # the tiled void-and-cluster mask (reference: blueNoiseRandGen.h tiles)
    if static.flags.blue_noise:
        from ..render.sampling import blue_offsets_flat, rand2_bn
        rows = blue_offsets_flat(w, h, n_pix).reshape(h, w, 2)
        if static.use_megakernel and interlace:
            # each field gets ITS rows' blue-noise offsets (static slices
            # of the numpy mask; the traced parity just selects)
            pe = jnp.asarray(_np.pad(
                rows[0::2], ((0, hp - ht), (0, wp - w), (0, 0)),
                mode="edge"))
            po = jnp.asarray(_np.pad(
                rows[1::2], ((0, hp - ht), (0, wp - w), (0, 0)),
                mode="edge"))
            bn = jnp.where(parity == 1, po, pe)
        elif static.use_megakernel:
            bn = jnp.asarray(_np.pad(
                rows, ((0, hp - h), (0, wp - w), (0, 0)), mode="edge"))
        else:
            flat = rows.reshape(n_pix, 2)
            bn = jnp.asarray(_np.concatenate(
                [flat, _np.broadcast_to(flat[-1], (n_pad - n_pix, 2))])
                if n_pad > n_pix else flat)
        jitter = rand2_bn(bn, frame_idx, jnp.uint32(0))
        lens = rand2_bn(bn, frame_idx, jnp.uint32(256))
    else:
        bn = None
        jitter = rand2(pixel_ids, frame_idx, jnp.uint32(0))
        lens = rand2(pixel_ids, frame_idx, jnp.uint32(256))
    rays = generate_rays_padded(basis, w, h, pixel_ids, jitter, lens)

    # optional composed environment: sky + ocean + stars for escaped rays
    # (the reference's dormant sky2 -> star -> water chain, active here
    # behind static flags — render/environment.py)
    if static.flags.ocean or static.flags.stars:
        from ..render.environment import env_radiance_scene
        t_env = (state.time if state.time is not None
                 else frame_idx.astype(jnp.float32) * dt)
        env_fn = lambda o, d: env_radiance_scene(
            sky, o, d, t_env, ocean=static.flags.ocean,
            stars=static.flags.stars)
    else:
        env_fn = None

    # ---- path trace: megakernel (one Pallas launch) or wavefront ----
    if static.use_megakernel:
        from ..render.megakernel import path_trace_mega
        if static.stop_after == "steps":
            # traversal-step telemetry (profile_frame.py --trace-steps):
            # (SEGMENTS+1, h, w) = [total, seg0, seg1, ...]
            steps = path_trace_mega(
                scene, rays, pixel_ids, frame_idx, prev_basis, w / h,
                use_proctex=static.flags.procedural_textures, bn=bn,
                subtile_rows=static.bounce_subtile, leaf_width=leaf_width,
                attr_hbm=static.attr_hbm, attr_pad=static.attr_pad,
                node_pad=static.node_pad,
                interpret=static.pallas_interpret, debug_steps=True)
            return (steps[:, :ht, :w],), state
        gbuf: GBuffer = path_trace_mega(
            scene, rays, pixel_ids, frame_idx, prev_basis, w / h,
            use_proctex=static.flags.procedural_textures, bn=bn,
            subtile_rows=static.bounce_subtile, leaf_width=leaf_width,
            attr_hbm=static.attr_hbm, attr_pad=static.attr_pad,
            node_pad=static.node_pad, ftex=static.ftex,
            interpret=static.pallas_interpret, env_fn=env_fn,
            mesh=trace_mesh)
        crop = lambda x: x[:ht, :w]
    else:
        gbuf: GBuffer = path_trace(
            scene, rays, pixel_ids, frame_idx, prev_basis,
            w / h, max_steps=static.max_traversal_steps,
            use_packets=static.use_packets,
            use_proctex=static.flags.procedural_textures, bn=bn,
            env_fn=env_fn, leaf_width=leaf_width)
        crop = lambda x: x[:n_pix].reshape((h, w) + x.shape[1:])

    # live NaN guards in the hot path under RTRT_DEBUG=1 (the reference
    # wires NAN_DETECTER into its hot kernels, src/pathtrace.cuh:113-117);
    # no-ops (and identical programs) when the flag is off
    from ..utils.debug import nan_guard
    shard = row_sharding if row_sharding is not None else (lambda x: x)
    if interlace:
        # full-res reconstruction: traced rows land at y = 2i+parity,
        # missing rows fill from vertical neighbors — LINEAR for radiance
        # planes (halves comb artifacts pre-denoise), NEAREST for geometry
        # planes (averaging depth/ids across silhouettes invents surfaces
        # that would poison the temporal validity test).  The temporal
        # filter then overwrites filled rows with reprojected history
        # wherever it is valid; a static camera sees every row every 2
        # frames, so accumulation converges to the full-rate image.
        def _lin(c):
            nxt = jnp.concatenate([c[1:], c[-1:]], axis=0)
            prv = jnp.concatenate([c[:1], c[:-1]], axis=0)
            even = interleave_rows(c, (c + nxt) * 0.5)
            odd = interleave_rows((prv + c) * 0.5, c)
            return jnp.where(parity == 1, odd, even)

        def _nn(c):
            # replicate: rows 2i and 2i+1 both read traced row i — the
            # result is parity-independent, so no select is needed
            return interleave_rows(c, c)
    else:
        _lin = _nn = lambda c: c
    color = shard(nan_guard(_lin(crop(gbuf.color)), "trace.radiance"))
    albedo = shard(nan_guard(_lin(crop(gbuf.albedo)), "trace.albedo"))
    normal = shard(nan_guard(_nn(crop(gbuf.normal)), "trace.normal"))
    depth = shard(_nn(crop(gbuf.depth)))
    mat_id = shard(_nn(crop(gbuf.mat_id)))
    motion = shard(nan_guard(_nn(crop(gbuf.motion)), "trace.motion"))
    if static.stop_after == "trace":
        return (color, albedo, normal, depth, mat_id, motion), state

    # ---- SVGF denoise ----
    # pallas_interpret validates the MEGAKERNEL path off-TPU; the denoise/
    # post Pallas variants have XLA-equivalent twins (parity-tested), so
    # interpret runs route those stages through the XLA paths
    use_pallas_aux = (static.use_packets and not static.pallas_interpret
                      and static.pallas_aux)
    if static.flags.denoise:
        parity = (frame_idx & 1).astype(jnp.int32)
        # arbitrary-motion history: Pallas tile-shift on TPU, gather on CPU
        rep_mode = "tile_shift" if use_pallas_aux else "gather"
        final, new_history = denoise(color, albedo, normal, depth, mat_id,
                                     motion, state.history, params.denoise,
                                     static.flags,
                                     frame_parity=parity,
                                     reproject_mode=rep_mode)
    else:
        final = color * albedo
        new_history = state.history
    if static.stop_after == "denoise":
        return (final, new_history), state

    # ---- postprocess ----
    sun_uv, sun_z = world_to_screen(basis, basis.pos + sky.sun_dir * 1e4,
                                    w / h)
    # sun visibility: depth at the sun pixel is sky (reference LensFlarePred)
    sx = jnp.clip((sun_uv[0] * w).astype(jnp.int32), 0, w - 1)
    sy = jnp.clip((sun_uv[1] * h).astype(jnp.int32), 0, h - 1)
    sun_visible = jnp.where((sun_z > 0) & ~jnp.isfinite(depth[sy, sx]),
                            1.0, 0.0)

    if static.flags.postprocess:
        image, new_exposure = postprocess(final, state.exposure, dt, sun_uv,
                                          sun_visible, params.post,
                                          static.flags, sh, sw, frame_idx,
                                          use_pallas=use_pallas_aux)
    else:
        ldr = jnp.clip(final, 0.0, 1.0) ** (1.0 / 2.2)
        if (sh, sw) != (h, w):
            from ..ops.resize import upscale_catmull_rom
            ldr = jnp.clip(upscale_catmull_rom(ldr, sh, sw), 0.0, 1.0)
        image = (ldr * 255.0 + 0.5).astype(jnp.uint8)
        new_exposure = state.exposure

    new_time = (state.time + dt) if state.time is not None else None
    new_state = FrameState(vertices=state.vertices, normals=state.normals,
                           history=new_history, exposure=new_exposure,
                           frame_idx=frame_idx + 1, time=new_time)
    return image, new_state


def make_frame_fn(static: FrameStatic, refit_plan=None):
    """Compile the frame program for a static configuration.

    refit_plan: optional bvh.refit.RefitPlan for the animated refit path —
    closed over (its numpy index schedule must stay concrete, not traced).

    The scoped-VMEM limit is raised for the megakernel frame: at 1080p XLA
    elects to keep several of the kernel's (n_tiles,16,128) outputs in VMEM
    to feed the denoise fusions, which blows the default 16 MiB scoped
    budget (v5e has 128 MiB physical VMEM — 64 MiB scoped is safe)."""
    opts = ({"xla_tpu_scoped_vmem_limit_kib": "114688"}
            if static.use_megakernel else None)
    fn = partial(render_frame, static, refit_plan=refit_plan)
    try:
        return jax.jit(fn, compiler_options=opts)
    except TypeError:  # older jax without compiler_options
        return jax.jit(fn)
