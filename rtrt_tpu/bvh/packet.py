"""Packet BVH traversal — the TPU-native hot path (Pallas kernel).

Why packets: profiling showed XLA per-lane gathers run at ~116M elem/s on
v5e (near-serial), so the classic one-ray-one-lane wavefront — which needs
~14-38 gathered elements per ray per step — is bandwidth-hopeless on TPU.
Packet traversal inverts the layout: a TILE of 1024 rays (one (8,128) vreg
set) shares ONE traversal stack held in scalar memory.  Per step the kernel

  * pops a node index (scalar, SMEM),
  * fetches its 12-float child-AABB pair + 2 children with a scalar
    dynamic-slice (no gather — the index is uniform across the tile),
  * slab-tests ALL 1024 rays against both boxes on the VPU (dense, masked),
  * tests leaf triangles for all rays the same way (triangle data is a
    uniform scalar row, broadcast to lanes),
  * descends into the child whose minimum entry distance over the tile is
    nearer; pushes the other if any lane hit it.

This is the SIMD packet tracing of Wald et al. reshaped for a 1024-lane
vector machine, replacing the reference's per-thread SIMT traversal
(reference: src/traverse.h:107-253).  Cost model: per-tile steps = union of
member rays' node visits (coherence-dependent), but every step is pure
dense VPU work + one scalar fetch.  Primary/shadow rays are coherent by
image locality; bounce rays inherit pixel-tile locality.

The kernel consumes the same flattened two-level node/triangle tables as
bvh/traverse.py, pre-swizzled by `pack_for_packets` into row layout:
  nodes_f32: (Mn, 16) [12 box floats | child entry bits x2 | pad]
  tris_f32:  (T, 16)  [v0|v1|v2|pad]
  attr_f32:  (T, 16)  [9 shading-normal floats | geometric normal |
                       material bits | pad]
(integer fields ride as exact-f32 lanes — one record fetch per event).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .types import (BATCH_SIZE, BLAS_NODES, GROUP, SceneBvh, entry_batch,
                    entry_idx, entry_is_blas, entry_is_leaf)

# Rays per packet and the pixel-block shape a packet covers (frame.py
# order).  8192 as (64,128) measured best of 1k/2k/4k/8k/16k at 1080p
# terrain in round 1 (pre-megakernel).  RTRT_TILE_SHAPE="HxW" overrides at
# import for tuning sweeps (H multiple of 8, W multiple of 128) —
# tools/tune_tile.py.
import os as _os

_ts = _os.environ.get("RTRT_TILE_SHAPE")
if _ts:
    TILE_SHAPE = tuple(int(x) for x in _ts.lower().split("x"))
    assert TILE_SHAPE[0] % 8 == 0 and TILE_SHAPE[1] % 128 == 0, _ts
else:
    # r4 sweep (terrain 1080p, padded node rows, segment skips):
    # 64x128 -> 131.1 ms, 32x128 -> 129.2, 16x128 -> 131.3, 8x128 -> 151.3
    # — an interior optimum at 32 rows (narrower tiles lose to union-step
    # growth, wider to per-step vector cost).  Round-1's 64x128 predated
    # the megakernel + strip machinery.
    TILE_SHAPE = (32, 128)
TILE = TILE_SHAPE[0] * TILE_SHAPE[1]
STACK = 512          # shared per-tile stack depth (scalars in SMEM).
                     # Big (64x128-px) tiles union many subtrees; 64 was
                     # observed to overflow on the terrain scene, silently
                     # dropping far-child pushes (missing-geometry tiles)
PACKET_MAX_STEPS = 16384

RAY_TMIN = 1e-4

# Leaf triangle test: "mt" = Möller-Trumbore with PRECOMPUTED EDGES
# (reference offers it at src/geometry.cuh:267) or "wt" = watertight
# (JCGT 2013, shear + same-sign — reference default,
# src/geometry.cuh:406-472).  MT is ~25% fewer VPU ops across an 8-record
# leaf row (no per-vertex shear/permute) and measured 149.4 -> 139.8 ms on
# terrain 1080p; the theoretical cost is losing the watertightness
# guarantee on shared edges, measured as SSIM(wt, mt) = 0.99999 with
# ~7e-6 of pixels differing >4 LSB at 1080p (isolated speckles the
# temporal accumulation absorbs) — so MT is the default and watertight
# stays available via RTRT_SURGERY=wt_tri.  The flag switches BOTH the
# pack layout (rows become [v0|e1|e2]) and the kernel test — read once at
# import so every consumer agrees.
TRI_TEST = "wt" if "wt_tri" in _os.environ.get("RTRT_SURGERY", "") else "mt"

_IDX_MASK = (1 << 11) - 1
_BATCH_SHIFT = 11
_BATCH_MASK = (1 << 11) - 1
_BLAS_BIT = 1 << 22
_LEAF_BIT = 1 << 23


class PacketTables(NamedTuple):
    """128-lane packed record tables consumed by the packet kernel.

    Each table row holds 8 records of 16 floats side by side; a record is
    fetched with one dynamic sublane read + one lane rotate (pltpu.roll).
    Dense packing keeps the whole table set VMEM-resident at ~64 B/record
    (a 16-wide row layout pads every row to 128 lanes in VMEM — 8-64x the
    footprint, which blew the scoped-VMEM budget and capped scene size).

    Integer fields ride INSIDE the float rows as exact-f32 values (all
    are < 2^24: packed entries use bits 0..23, material ids are small) so
    the hot loops issue ONE record fetch per event instead of two/three
    (the dynamic sublane read + rotate machinery, not the vector math,
    dominates per-event cost):
      node record:  [12 child-AABB floats, child_L, child_R, -, -]
      attr record:  [9 shading-normal floats, 3 geometric-normal floats,
                     material-id, -, -, -]  (geometric normal is
                     per-triangle constant — precomputed at pack time)"""

    nodes_f32: jnp.ndarray  # (ceil(Mn/8), 128)  8 nodes/row x 16 lanes
    tris_f32: jnp.ndarray   # (ceil(T/8), 128)   8 tris/row x 16 floats
    attr_f32: jnp.ndarray   # (ceil(T/8), 128)   8 tris/row x 16 lanes


def packed_rows(n: int, stride: int) -> int:
    """Row count of a packed (R,128) table holding n records of `stride`
    lanes — the exact shape math of `_pack_rows`, exposed so the engine's
    VMEM-budget fit decision uses REAL table sizes, not estimates
    (engine.packet_fit_mode / Engine._actual_fit_mode)."""
    per = 128 // stride
    return -(-(-(-n // per)) // 8) * 8


def _pack_rows(a, stride):
    """(N, C<=stride) -> (R, 128): 128//stride records per row, rows padded
    to a multiple of 8 (aligned whole-table DMAs)."""
    n, c = a.shape
    per = 128 // stride
    rows = packed_rows(n, stride)
    out = jnp.zeros((rows * per, stride), a.dtype)
    out = out.at[:n, :c].set(a)
    return out.reshape(rows, 128)


def pack_for_packets(bvh: SceneBvh, tri_nrm_t=None, tri_mat=None,
                     attr_pad=False) -> PacketTables:
    """Swizzle the column-major SceneBvh tables into kernel row layout.

    tri_nrm_t: (9, T) sorted vertex normals; tri_mat: (T,) sorted material
    ids — both optional (zero/one filled when the caller only traverses).

    attr_pad=True stores ONE attr record per 128-lane row (x8 memory):
    the resolve loop's record fetch becomes a roll-free dynamic row read
    (same trade as pack_nodes4 — the dynamic lane rotate costs ~0.7 us
    per fetch).  Only chosen when the padded table fits the VMEM budget
    (engine._actual_fit_mode).
    """
    t = bvh.tris_t.shape[1]
    if tri_nrm_t is None:
        attr_f = jnp.zeros((t, 9), jnp.float32)
    else:
        attr_f = tri_nrm_t.T
    if tri_mat is None:
        tri_mat = jnp.zeros((t,), jnp.int32)
    # per-triangle geometric normal, precomputed so the post-traversal
    # attribute resolve needs no vertex fetch
    tt = bvh.tris_t
    e1 = tt[3:6] - tt[0:3]
    e2 = tt[6:9] - tt[0:3]
    gx = e1[1] * e2[2] - e1[2] * e2[1]
    gy = e1[2] * e2[0] - e1[0] * e2[2]
    gz = e1[0] * e2[1] - e1[1] * e2[0]
    gl = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-20))
    ng = jnp.stack([gx * gl, gy * gl, gz * gl], axis=1)  # (T,3)
    # packed stack entries use bits 0..23 (< 2^24) and material ids are
    # small, so both are EXACTLY representable as f32 — they ride the
    # float rows as plain values and the kernel converts back with a
    # scalar astype (Mosaic's tpu.bitcast only accepts vectors, and a
    # whole-row vector bitcast measured a 4x frame regression)
    mat_bits = tri_mat.astype(jnp.float32)[:, None]
    child_bits = bvh.children_t.T.astype(jnp.float32)  # (M,2)
    if TRI_TEST == "mt":
        # Möller-Trumbore rows carry precomputed edges: [v0 | v1-v0 | v2-v0]
        tri_rows = jnp.concatenate([tt[0:3], e1, e2], axis=0).T
    else:
        tri_rows = bvh.tris_t.T
    attr_cols = jnp.concatenate([attr_f, ng, mat_bits], axis=1)
    if attr_pad:
        q = attr_cols.shape[0]
        rows = -(-q // 8) * 8
        attr_packed = jnp.zeros((rows, 128), attr_cols.dtype)
        attr_packed = attr_packed.at[:q, :attr_cols.shape[1]].set(attr_cols)
    else:
        attr_packed = _pack_rows(attr_cols, 16)
    return PacketTables(
        nodes_f32=_pack_rows(
            jnp.concatenate([bvh.boxes_t.T, child_bits], axis=1), 16),
        tris_f32=_pack_rows(tri_rows, 16),
        attr_f32=attr_packed)


def pack_nodes4(nodes4, pad=True) -> jnp.ndarray:
    """(q,32) 4-wide node records (bvh/sah.py::bvh4_nodes) -> (R,128)
    table for the packet kernel's arity-4 traversal.

    pad=True (default): ONE record per row (lanes 32..127 padding).  The
    r4 surgical A/B (RTRT_SURGERY=static_fetch) measured the packed-record fetch
    machinery — dynamic sublane read + DYNAMIC lane rotate — at ~670 ns
    of the 1.29 us traversal step; row-per-record trades 4x node-table
    VMEM for a roll-free fetch (one dynamic ROW read, record lanes at
    static offsets).  pad=False keeps the dense 4-records-per-row layout
    (rolled fetch) for scenes where the padded table would push
    nodes+tris past the VMEM staging budget (the ~1M-tri envelope);
    traversal must then run with the matching node_pad=False."""
    n4 = jnp.asarray(nodes4)
    if not pad:
        return _pack_rows(n4, 32)
    q = n4.shape[0]
    rows = -(-q // 8) * 8
    out = jnp.zeros((rows, 128), n4.dtype)
    return out.at[:q, :32].set(n4)


# RTRT_SURGERY: comma-separated timing-only kernel surgery modes
# (tools/probe_traverse.py A/Bs — images are WRONG under these; never set
# in production):
#   static_fetch  record fetches read row 0 with no rotate — isolates the
#                 dynamic-slice + lane-roll machinery
#   no_prune      every pop is a full visit (ordered-traversal prune cond
#                 removed) — isolates the skip cond
#   no_leaf       leaf pops skip their triangle tests
#   simple_cond   loop runs to max_steps on a pure induction variable
#                 (probe runs pin max_steps low)
#   no_uv         drop the u/v carry planes from the find loop
#   no_tstack     no ordered-traversal t-stack (no tstack writes, pops
#                 never pruned by entry distance)
#   no_order      skip the near-first sort network (fixed order)
#   wt_tri        watertight (JCGT) triangle test instead of the default
#                 division-free Möller-Trumbore (precision oracle)
#   dense_nodes / dense_attrs: see engine.py (read there; listed for the
#                 single-registry docs)
_SURGERY = frozenset(
    m for m in _os.environ.get("RTRT_SURGERY", "").split(",") if m)
_STATIC_FETCH = "static_fetch" in _SURGERY
# xpose: consume record lanes via the MXU pre-broadcast (_bcast) instead
# of scalar extracts — measured r5: 955-1219 ns/step vs 804 for extracts
# (the 6-pass HIGHEST-precision outer product costs more than 72 extracts;
# the scalar unit evidently runs ahead fine).  A/B surgery, image correct.
_XPOSE = "xpose" in _SURGERY
_NO_PRUNE = "no_prune" in _SURGERY
_NO_LEAF = "no_leaf" in _SURGERY
_SIMPLE_COND = "simple_cond" in _SURGERY
_NO_UV = "no_uv" in _SURGERY
_NO_TSTACK = "no_tstack" in _SURGERY
_NO_ORDER = "no_order" in _SURGERY
# Deleted measured losers (kept ONLY as ROADMAP records, not knobs):
# branchless step (r5: 1206 ns/step vs 804 cond baseline — the kernel is
# throughput-bound, not cond-bound), cond-stride loop chaining (r4:
# 127.9 ms, noise), resolve-off (r4: VOID — corrupts path control flow),
# split-shadow traversal (r3: slower), per-segment lean attrs (r4: 144 ms
# vs 137 all-lean).


def _rec_fetch(ref, i, stride, interpret):
    """Fetch packed record i from a (R,128) table: one dynamic sublane read
    + one lane rotate; returns the rotated (1,128) row whose first `stride`
    lanes are the record.

    Callers consume lanes through `_lv` / `_ls` (lane k as a scalar).
    NOTE: an attempt to keep box/vertex lanes in the vector domain as
    (1,1) static slices broadcast against the ray tile died in Mosaic —
    "Broadcast in both sublanes and lanes: Not implemented", and neither
    two-stage broadcasts, optimization barriers, nor lane-0 rolls avoid
    the folding (probed on v5e, 2026-08).  Scalar extracts it is."""
    per = 128 // stride
    if _STATIC_FETCH:
        return ref[pl.ds(0, 1), :]
    row = ref[pl.ds(i // per, 1), :]          # (1,128)
    sh = stride * (i % per)
    if interpret:
        return jnp.roll(row, -sh, axis=1)
    shift = jnp.where(sh == 0, 0, 128 - sh)
    return pltpu.roll(row, shift, 1)


def _bcast(row):
    """(1,128) fetched row -> (128,128) X with X[k, :] = row[0, k]: a
    degenerate MXU outer product contracting the two size-1 dims.  Record
    value k then reads as the STATIC sublane slice X[k:k+1, :] — a
    (1,128) uniform vector that sublane-broadcasts against (S,128) ray
    tiles with ZERO vector->scalar extracts (each `row[0, k]` extract
    syncs the scalar and vector units; a leaf visit makes 72 of them).
    Mosaic cannot lane-broadcast (1,1) slices ("Broadcast in both
    sublanes and lanes: Not implemented"), but the MXU can: one
    dot_general turns the row into all 128 pre-broadcast values at once.
    HIGHEST precision keeps the pass-through exact in f32 (default TPU
    precision would round the geometry to bf16)."""
    return jax.lax.dot_general(
        row, jnp.ones((1, 128), row.dtype), (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _lv(row, k):
    """Value k of a fetched record: static sublane slice when given a
    `_bcast` matrix (vector domain, (1,128)); scalar extract when given
    the raw (1,128) row."""
    if row.shape[0] > 1:
        return row[k:k + 1, :]
    return row[0, k]


def _ls(row, k):
    """Lane k of a fetched (1,128) record as a scalar (control flow)."""
    return row[0, k]


def traverse_tile(nodes_f_ref, tris_ref, attr_f_ref,
                  stack_ref, tstack_ref, ox, oy, oz, dx, dy, dz, t_cap, *,
                  tlas_internal, any_hit, max_steps, first_hit=None,
                  lean=False, arity=2, leaf_width=1, interpret=False,
                  attr_hbm=False, attr_scratch=None, attr_sem=None,
                  attr_pad=False, node_pad=True):
    """Shared-stack packet traversal over one ray tile — pure kernel code,
    reusable from other Pallas kernels (the path-trace megakernel calls this
    once per bounce segment with the stack scratch it owns).

    ox..dz/t_cap: (sublane, lane) component arrays; stack_ref: SMEM (STACK,)
    i32 scratch; tstack_ref: SMEM (STACK,) f32 scratch (per-push tile-min
    entry distances for ordered-traversal pruning).  Returns the 12-tuple
      (t, tri, u, v, mat, nsx, nsy, nsz, ngx, ngy, ngz, steps)
    with t = +inf where tri < 0 (miss); steps = scalar i32 loop count
    (profiling: tools/profile_frame.py --trace-steps).

    lean=True carries ONLY (best_t, tri, u, v) through the traversal loop —
    no material / normal attribute planes — and returns zeros for
    mat/ns/ng.  Loop-carried tile arrays dominate the per-step cost
    (~46% of it scales with carried bytes), so the attribute-free find
    loop is markedly faster; callers resolve attributes afterwards from
    the winning (tri, u, v).

    first_hit: optional (sublane, lane) bool mask of PER-LANE any-hit
    lanes (shadow rays): on their first accepted hit, best_t collapses to
    0 so the lane stops contributing to the tile's step union — occlusion
    needs ANY hit under t_cap, not the closest (the lane's returned t is
    meaningless; tri >= 0 is the occlusion flag).  The static `any_hit`
    flag additionally terminates the WHOLE tile once every lane resolved.

    attr_hbm=True leaves the ATTRIBUTE table in HBM (attr_f_ref is an ANY/
    HBM ref): the post-loop resolve DMAs single records on demand into
    `attr_scratch` ((2,128) VMEM rows, one per end of the dual-ended
    resolve; `attr_sem` a 2+-slot DMA semaphore array).  The hot find loop
    never touches attributes (requires lean=True), so only the per-distinct-
    winner resolve pays the HBM latency — and the VMEM staging budget drops
    from nodes+tris+attr to nodes+tris, raising the packet path's scene
    ceiling to ~1M triangles (the reference's envelope,
    reference: src/kernel.cuh:54-55).

    Pruning (packet ordered traversal): each pushed far child records the
    tile-min slab entry `tn` alongside its stack entry; the scalar prune
    bound is the max over lanes of the current best hit.  A popped node
    whose recorded entry is beyond the bound cannot improve ANY lane
    (tn_lane >= tile_min >= bound >= best_lane), so the whole vector body
    (fetch, 2 slab tests, leaf triangle tests) is skipped via lax.cond —
    the step degrades to a few scalar ops.  To keep the bound finite even
    when rays escape to the sky, best_t is initialized to each lane's exit
    distance from the scene's ROOT AABB (a hit beyond the root exit is
    impossible), not +inf.
    """
    if attr_hbm:
        # attributes only exist in the post-loop resolve; the find loop and
        # leaf visits must stay attribute-free
        assert lean and attr_scratch is not None and attr_sem is not None
    tiny = jnp.float32(1e-20)
    sdx = jnp.where(jnp.abs(dx) < tiny, jnp.where(dx >= 0, tiny, -tiny), dx)
    sdy = jnp.where(jnp.abs(dy) < tiny, jnp.where(dy >= 0, tiny, -tiny), dy)
    sdz = jnp.where(jnp.abs(dz) < tiny, jnp.where(dz >= 0, tiny, -tiny), dz)
    ix = 1.0 / sdx
    iy = 1.0 / sdy
    iz = 1.0 / sdz

    # watertight permutation per lane
    ax_ = jnp.abs(dx)
    ay_ = jnp.abs(dy)
    az_ = jnp.abs(dz)
    kz = jnp.where((az_ >= ax_) & (az_ >= ay_), 2,
                   jnp.where(ay_ >= ax_, 1, 0)).astype(jnp.int32)
    kx = jnp.where(kz == 2, 0, jnp.where(kz == 1, 2, 1))
    ky = jnp.where(kz == 2, 1, jnp.where(kz == 1, 0, 2))
    # preserve winding
    dmaj = jnp.where(kz == 2, dz, jnp.where(kz == 1, dy, dx))
    swap = dmaj < 0.0
    kx, ky = jnp.where(swap, ky, kx), jnp.where(swap, kx, ky)

    def sel(k, x, y, z):
        return jnp.where(k == 0, x, jnp.where(k == 1, y, z))

    dkx = sel(kx, sdx, sdy, sdz)
    dky = sel(ky, sdx, sdy, sdz)
    dkz = sel(kz, sdx, sdy, sdz)
    sz = 1.0 / dkz
    sx = dkx * sz
    sy = dky * sz

    far_scale = jnp.float32(1.0 + 3.6e-7)

    def slab(lo0, lo1, lo2, hi0, hi1, hi2, best):
        tn = jnp.maximum(
            jnp.maximum((jnp.where(ix < 0, hi0, lo0) - ox) * ix,
                        (jnp.where(iy < 0, hi1, lo1) - oy) * iy),
            (jnp.where(iz < 0, hi2, lo2) - oz) * iz)
        tf = jnp.minimum(
            jnp.minimum((jnp.where(ix < 0, lo0, hi0) - ox) * ix,
                        (jnp.where(iy < 0, lo1, hi1) - oy) * iy),
            (jnp.where(iz < 0, lo2, hi2) - oz) * iz) * far_scale
        hit = (tn <= tf) & (tf > RAY_TMIN) & (tn < best)
        return hit, tn

    def tri_hit(v, best, off=0):
        """v: fetched (1,128) record; vectorized watertight or
        Möller-Trumbore (TRI_TEST) over the tile (vertex lanes ride as
        (1,1) broadcasts — no scalar extracts).
        off: lane offset of the record inside the row (row-aligned
        multi-triangle leaves read ONE row and test its 8 records at
        static offsets 16k — no per-record fetch machinery)."""
        if TRI_TEST == "mt":
            # record lanes: [v0 | e1 | e2] (edges precomputed at pack
            # time).  Division-free accept: compare u/v/t against
            # |det|-scaled bounds, one reciprocal only for the outputs.
            v0x, v0y, v0z = _lv(v, off + 0), _lv(v, off + 1), _lv(v, off + 2)
            e1x, e1y, e1z = _lv(v, off + 3), _lv(v, off + 4), _lv(v, off + 5)
            e2x, e2y, e2z = _lv(v, off + 6), _lv(v, off + 7), _lv(v, off + 8)
            px = ox - v0x
            py = oy - v0y
            pz = oz - v0z
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            det = e1x * hx + e1y * hy + e1z * hz
            uq = px * hx + py * hy + pz * hz
            qx = py * e1z - pz * e1y
            qy = pz * e1x - px * e1z
            qz = px * e1y - py * e1x
            vq = dx * qx + dy * qy + dz * qz
            tq = e2x * qx + e2y * qy + e2z * qz
            adet = jnp.abs(det)
            sg = jnp.sign(det)
            u_s = uq * sg
            v_s = vq * sg
            t_s = tq * sg
            ok = (det != 0.0) & (u_s >= 0.0) & (v_s >= 0.0) \
                & (u_s + v_s <= adet) \
                & (t_s > RAY_TMIN * adet) & (t_s < best * adet)
            inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
            return ok, tq * inv, uq * inv, vq * inv

        def prep(c0, c1, c2):
            px = c0 - ox
            py = c1 - oy
            pz = c2 - oz
            return (sel(kx, px, py, pz), sel(ky, px, py, pz),
                    sel(kz, px, py, pz))

        axx, axy, axz = prep(_lv(v, off + 0), _lv(v, off + 1), _lv(v, off + 2))
        bxx, bxy, bxz = prep(_lv(v, off + 3), _lv(v, off + 4), _lv(v, off + 5))
        cxx, cxy, cxz = prep(_lv(v, off + 6), _lv(v, off + 7), _lv(v, off + 8))
        aex = axx - sx * axz
        aey = axy - sy * axz
        bex = bxx - sx * bxz
        bey = bxy - sy * bxz
        cex = cxx - sx * cxz
        cey = cxy - sy * cxz
        uu = cex * bey - cey * bex
        vv = aex * cey - aey * cex
        ww = bex * aey - bey * aex
        same = ((uu >= 0) & (vv >= 0) & (ww >= 0)) | \
            ((uu <= 0) & (vv <= 0) & (ww <= 0))
        det = uu + vv + ww
        t_s = uu * (sz * axz) + vv * (sz * bxz) + ww * (sz * cxz)
        ts = t_s * jnp.sign(det)
        absdet = jnp.abs(det)
        ok = same & (det != 0.0) & (ts > RAY_TMIN * absdet) & (ts < best * absdet)
        inv_det = jnp.where(det != 0.0, 1.0 / det, 0.0)
        return ok, t_s * inv_det, vv * inv_det, ww * inv_det

    # ---- per-lane scene-exit cap (finite prune bound even for sky rays) --
    # Root node row 0 holds the TLAS root's two child AABBs; their union is
    # the scene bounds.  A true hit point lies inside the root box, so
    # t_hit <= root exit; capping best_t there (with f32 slack) is exact.
    stride = 16 if arity == 2 else 32
    nf0 = _rec_fetch(nodes_f_ref, 0, stride, interpret)
    # union over the root's child boxes = scene bounds (empty 4-wide slots
    # carry inverted boxes: +inf lo / -inf hi, identity under min/max)
    rlo = tuple(
        functools.reduce(jnp.minimum,
                         [_lv(nf0, 6 * c + k) for c in range(arity)])
        for k in range(3))
    rhi = tuple(
        functools.reduce(jnp.maximum,
                         [_lv(nf0, 6 * c + 3 + k) for c in range(arity)])
        for k in range(3))
    r_tn = jnp.maximum(
        jnp.maximum((jnp.where(ix < 0, rhi[0], rlo[0]) - ox) * ix,
                    (jnp.where(iy < 0, rhi[1], rlo[1]) - oy) * iy),
        (jnp.where(iz < 0, rhi[2], rlo[2]) - oz) * iz)
    r_tf = jnp.minimum(
        jnp.minimum((jnp.where(ix < 0, rlo[0], rhi[0]) - ox) * ix,
                    (jnp.where(iy < 0, rlo[1], rhi[1]) - oy) * iy),
        (jnp.where(iz < 0, rlo[2], rhi[2]) - oz) * iz) * far_scale
    hit_root = (r_tn <= r_tf) & (r_tf > RAY_TMIN)
    exit_cap = jnp.where(hit_root, r_tf * 1.001 + 1e-2, 0.0)

    shape = ox.shape
    zf = lambda: jnp.zeros(shape, jnp.float32)
    # done lanes (t_cap <= 0) must leave the union COMPLETELY: with a 0
    # bound the slab test tn < 0 still passes for every box containing the
    # lane's origin (tn is negative inside), keeping its whole ancestor
    # chain in play; -inf excludes everything
    best0 = jnp.where(t_cap > 0.0, jnp.minimum(t_cap, exit_cap),
                      -jnp.inf)
    # loop-carried hit state: (best_t, tri, u, v) always; the attribute
    # planes (mat, shading normal, geometric normal) only when not lean —
    # carried tile arrays are the scaling part of the per-step cost
    hs0 = (best0, jnp.full(shape, -1, jnp.int32), zf(), zf())
    if not lean:
        hs0 = hs0 + (jnp.zeros(shape, jnp.int32),
                     zf(), zf(), zf(), zf(), zf(), zf())
    nh = len(hs0)

    tris_rows = tris_ref.shape[0]
    attr_rows = attr_f_ref.shape[0] if attr_f_ref is not None else 0
    node_rows = nodes_f_ref.shape[0]

    # Leaf visit: test the leaf's triangles against every lane.  Leaves
    # ride the SHARED STACK like internal nodes (the leaf bit is already in
    # the packed entry), so each loop iteration makes ONE leaf/internal
    # dispatch instead of 2-4 maybe-leaf lax.conds per internal step —
    # AND deferred leaves are ordered-traversal PRUNED: a leaf pushed with
    # its tile-min entry is skipped outright when a nearer accepted hit
    # tightens the bound below it, saving its 8 triangle tests (the fat
    # part of a step).  This is the reference's one-dispatch-per-iteration
    # inner loop (reference: src/traverse.h:107-253) vectorized over the
    # tile.  Surface attributes (shading/geometric normals, material) are
    # computed AT ACCEPT TIME from scalar rows — the integrator never
    # gathers per-triangle data again.  carry = hs + (leafv, bound).
    def leaf_body(e, args, mask=None):
        # mask: optional SCALAR predicate (branchless step) — accepts and
        # the bound/leafv updates apply only when it holds
        best_t, tri, uo, vo = args[0:4]
        leafv, drops, bound = args[-3:]
        base = ((e >> _BATCH_SHIFT) & _BATCH_MASK) * BATCH_SIZE \
            + (e & _IDX_MASK) * GROUP
        # test the leaf's triangles and reduce to a per-lane
        # best-of-group FIRST — the carry planes and the prune bound
        # are then updated once per leaf visit, not once per triangle
        # (tri tests are pure vector work; bound updates are scalar
        # syncs).  Row-aligned leaves (leaf_width == 8, flat SAH trees
        # built with leaf_max=8) read the WHOLE leaf with one static
        # row slice — no per-record dynamic fetch/rotate — and test
        # its 8 records at static lane offsets; short leaves carry
        # duplicates of their first triangle (harmless real geometry).
        if leaf_width > 1:
            # row-aligned wide leaves: leaf_width/8 CONSECUTIVE rows read
            # with one dynamic sublane slice; records at static offsets.
            # Wider leaves amortize the per-visit overhead (r4: a leaf
            # visit costs ~2 us largely independent of its vector work)
            # and shrink the tree — RTRT_LEAF_WIDTH sweeps 8/16/32.
            # The row index clamps: masked-out (branchless) visits carry
            # garbage entries and must not read out of range.
            assert leaf_width % 8 == 0 and GROUP == 1
            rpl = leaf_width // 8
            brow = jnp.clip(base // 8, 0, tris_rows - rpl)
            blk = tris_ref[pl.ds(0 if _STATIC_FETCH else brow, rpl), :]
            if _XPOSE:
                # one MXU pre-broadcast per row: the 8 records' 72 values
                # become static sublane slices (zero scalar extracts)
                xrows = [_bcast(blk[i:i + 1, :]) for i in range(rpl)]
            else:
                xrows = [blk[i:i + 1, :] for i in range(rpl)]
            recs = [(base + k, xrows[k // 8], 16 * (k % 8))
                    for k in range(leaf_width)]
        else:
            recs = [(base + k,
                     _rec_fetch(tris_ref, base + k, 16, interpret), 0)
                    for k in range(GROUP)]
        # (a log-depth best-of-8 combine tree was tried here r4 — the
        # record-by-record chain below measured the same frame time, so
        # the simple form stays; the step is not select-chain-bound)
        gt = jnp.full(shape, jnp.inf, jnp.float32)
        gtri = jnp.zeros(shape, jnp.int32)
        gu = zf()
        gv = zf()
        for t_idx, v, off in recs:
            ok, tt, tu, tv = tri_hit(v, best_t, off)
            gb = ok & (tt < gt)
            gt = jnp.where(gb, tt, gt)
            gtri = jnp.where(gb, t_idx, gtri)
            if not _NO_UV:  # surgery: drop the u/v carry updates
                gu = jnp.where(gb, tu, gu)
                gv = jnp.where(gb, tv, gv)
        # tri_hit already enforces tt < best_t, so any finite
        # group-best is an improvement
        better = gt < best_t
        if mask is not None:
            better = better & mask
        tt = gt
        if first_hit is not None:
            # per-lane any-hit: an occluded shadow lane leaves the
            # union entirely (-inf best fails every slab and triangle
            # test; callers never read its t)
            tt = jnp.where(first_hit & better, -jnp.inf, tt)
        new_best = jnp.where(better, tt, best_t)
        out = (new_best,
               jnp.where(better, gtri, tri),
               jnp.where(better, gu, uo),
               jnp.where(better, gv, vo))
        if not lean:
            mat, nsx, nsy, nsz, ngx, ngy, ngz = args[4:11]
            if leaf_width > 1:
                a_blk = attr_f_ref[pl.ds(jnp.clip(base, 0,
                                                  attr_rows - leaf_width),
                                         leaf_width), :] if attr_pad \
                    else attr_f_ref[pl.ds(brow, leaf_width // 8), :]
            for k, (t_idx, _, off) in enumerate(recs):
                m = better & (gtri == t_idx)
                # one attr fetch: shading normals, precomputed
                # geometric normal, material bits
                if leaf_width > 1:
                    a = a_blk[k:k + 1, :] if attr_pad \
                        else a_blk[(k // 8):(k // 8) + 1, :]
                else:
                    a = _rec_fetch(attr_f_ref, t_idx, 16, interpret)
                # padded rows carry the record at lane 0 regardless of off
                aoff = 0 if (attr_pad and leaf_width > 1) else off
                am = _lv(a, aoff + 12).astype(jnp.int32)
                # interpolated shading normal (rows x bary)
                tw = 1.0 - gu - gv
                inx = tw * _lv(a, aoff + 0) + gu * _lv(a, aoff + 3) \
                    + gv * _lv(a, aoff + 6)
                iny = tw * _lv(a, aoff + 1) + gu * _lv(a, aoff + 4) \
                    + gv * _lv(a, aoff + 7)
                inz = tw * _lv(a, aoff + 2) + gu * _lv(a, aoff + 5) \
                    + gv * _lv(a, aoff + 8)
                mat = jnp.where(m, am, mat)
                nsx = jnp.where(m, inx, nsx)
                nsy = jnp.where(m, iny, nsy)
                nsz = jnp.where(m, inz, nsz)
                ngx = jnp.where(m, _lv(a, aoff + 9), ngx)
                ngy = jnp.where(m, _lv(a, aoff + 10), ngy)
                ngz = jnp.where(m, _lv(a, aoff + 11), ngz)
            out = out + (mat, nsx, nsy, nsz, ngx, ngy, ngz)
        # prune bound tightens as lanes accept hits
        if mask is not None:
            return out + (leafv + jnp.where(mask, len(recs), 0), drops,
                          jnp.where(mask, jnp.max(new_best), bound))
        return out + (leafv + len(recs), drops, jnp.max(new_best))

    def _visit4(row, sp, hs, leafv, drops, bound, best_t, mask=None):
        """4-wide node visit (flat SAH4 trees, bvh/sah.py): one stride-32
        record fetch serves two binary levels — 4 slab tests, up to 3
        pushes via a 5-comparator scalar sort network, nearest continues.
        Same fetch machinery cost as the binary record; ~halves steps."""
        if node_pad:
            # row-per-record node table (pack_nodes4): roll-free read
            nf = nodes_f_ref[pl.ds(0 if _STATIC_FETCH else row, 1), :]
        else:
            nf = _rec_fetch(nodes_f_ref, row, 32, interpret)
        if _XPOSE:
            # MXU pre-broadcast: the 24 box floats feed the slab tests as
            # (1,128) uniform vectors; the 4 child entries still extract
            # as scalars from the raw row (they drive control flow)
            nf_raw, nf = nf, _bcast(nf)
        else:
            nf_raw = nf
        es, rows_ = [], []
        for c in range(4):
            h_c, t_c = slab(_lv(nf, 6 * c), _lv(nf, 6 * c + 1),
                            _lv(nf, 6 * c + 2), _lv(nf, 6 * c + 3),
                            _lv(nf, 6 * c + 4), _lv(nf, 6 * c + 5), best_t)
            # sublane-reduce each child's masked entry map to a (1,128)
            # row (pure vector work)
            rows_.append(jnp.min(jnp.where(h_c, t_c, jnp.inf), axis=0,
                                 keepdims=True))
            es.append(_ls(nf_raw, 24 + c).astype(jnp.int32))
        # merge the four lane-reduction trees into ONE: stack the four
        # (1,128) rows and lane-reduce once to (4,1), then 4 cheap scalar
        # extracts — replaces 4 full (S,128)->scalar reductions whose lane
        # trees each cost a 7-step roll/min chain
        m4 = jnp.min(jnp.concatenate(rows_, axis=0), axis=1)  # (4,)
        mins = [m4[c] for c in range(4)]

        # candidates (leaf AND internal — leaves ride the stack), sorted
        # near-first by tile-min entry.  Empty slots (entry -1) carry
        # inverted boxes -> min == inf, never valid.
        pairs = [(mins[c], es[c]) for c in range(4)]

        def cswap(a, b):
            sw = a[0] > b[0]
            return ((jnp.where(sw, b[0], a[0]), jnp.where(sw, b[1], a[1])),
                    (jnp.where(sw, a[0], b[0]), jnp.where(sw, a[1], b[1])))

        p0, p1, p2, p3 = pairs
        if not _NO_ORDER:  # surgery: skip near-first ordering
            p0, p1 = cswap(p0, p1)
            p2, p3 = cswap(p2, p3)
            p0, p2 = cswap(p0, p2)
            p1, p3 = cswap(p1, p3)
            p1, p2 = cswap(p1, p2)
        # push far-to-near so the nearest pops first.  Valid candidates
        # sort to the front (inf last); each write is predicated on
        # validity + capacity (a full stack drops the deepest pushes, as
        # the reference's 16-deep stack does — src/traverse.h:35)
        # unconditional trash-slot stores (see the binary-push comment)
        mT = True if mask is None else mask
        ok3 = (p3[0] < jnp.inf) & (sp < STACK) & mT
        c3 = ok3.astype(jnp.int32)
        w3 = jnp.where(ok3, sp, STACK)
        stack_ref[w3] = p3[1]
        if not _NO_TSTACK:
            tstack_ref[w3] = p3[0]
        ok2 = (p2[0] < jnp.inf) & (sp + c3 < STACK) & mT
        c2 = ok2.astype(jnp.int32)
        w2 = jnp.where(ok2, sp + c3, STACK)
        stack_ref[w2] = p2[1]
        if not _NO_TSTACK:
            tstack_ref[w2] = p2[0]
        ok1 = (p1[0] < jnp.inf) & (sp + c3 + c2 < STACK) & mT
        c1 = ok1.astype(jnp.int32)
        w1 = jnp.where(ok1, sp + c3 + c2, STACK)
        stack_ref[w1] = p1[1]
        if not _NO_TSTACK:
            tstack_ref[w1] = p1[0]
        # overflow telemetry: count valid candidates a full stack dropped
        # (a dropped far child = silently missing geometry for this tile;
        # the envelope bench asserts this stays 0 — RTRT_COUNT=drops)
        drops = drops \
            + (((p3[0] < jnp.inf) & mT & (c3 == 0)).astype(jnp.int32)
               + ((p2[0] < jnp.inf) & mT & (c2 == 0)).astype(jnp.int32)
               + ((p1[0] < jnp.inf) & mT & (c1 == 0)).astype(jnp.int32))
        sp = sp + c1 + c2 + c3
        ok0 = (p0[0] < jnp.inf) & mT
        nxt = jnp.where(ok0, p0[1], jnp.int32(-1))
        return (sp,) + hs + (leafv, drops, bound,
                             jnp.where(ok0, p0[0], jnp.inf), nxt)

    init = (jnp.int32(0),) + hs0 + (
        jnp.int32(0),                      # steps
        jnp.int32(0),                      # leaf visits (replay-log bound)
        jnp.int32(0),                      # dropped far-child pushes
        jnp.max(best0),                    # scalar prune bound
        jnp.float32(-jnp.inf),             # cur entry t (root: always)
        jnp.int32(0))                      # cur (TLAS root packed = 0)
    # cur = 0 is valid (TLAS root); sentinel for "no current" = -1

    def cond(s):
        sp, steps, bound, cur = s[0], s[-6], s[-3], s[-1]
        if _SIMPLE_COND:  # surgery: pure induction-variable trip count
            return steps < max_steps
        # bound == -inf: every lane is done/resolved — nothing can accept
        # a hit anymore, so skip the stack drain entirely
        return ((sp > 0) | (cur >= 0)) & (steps < max_steps) \
            & (bound != -jnp.inf)

    def step(s):
        sp = s[0]
        hs = s[1:1 + nh]
        steps, leafv, drops, bound, curt, cur = s[-6:]

        # pop when no current node (predicated select; SMEM read is cheap)
        need = cur < 0
        top = stack_ref[jnp.maximum(sp - 1, 0)]
        topt = jnp.float32(-jnp.inf) if _NO_TSTACK \
            else tstack_ref[jnp.maximum(sp - 1, 0)]
        cur = jnp.where(need, top, cur)
        curt = jnp.where(need, topt, curt)
        sp = jnp.where(need, sp - 1, sp)

        def visit_leaf(args):
            # deferred leaf pop: test its triangles, then pop again
            sp = args[0]
            if _NO_LEAF:  # timing-only surgery: leaf pops become no-ops
                return args + (jnp.float32(jnp.inf), jnp.int32(-1))
            carry = leaf_body(cur, args[1:])
            return (sp,) + carry + (jnp.float32(jnp.inf), jnp.int32(-1))

        def visit_internal(args):
            sp = args[0]
            hs = args[1:1 + nh]
            leafv, drops, bound = args[-3:]
            best_t = hs[0]
            idx = cur & _IDX_MASK
            batch = (cur >> _BATCH_SHIFT) & _BATCH_MASK
            is_blas = (cur & _BLAS_BIT) != 0
            # non-BLAS rows read the full 22-bit idx|batch field: TLAS
            # nodes carry batch == 0 (row == idx, the two-level layout) and
            # flat SAH trees use it as the whole node id (bvh/sah.py)
            row = jnp.where(is_blas,
                            tlas_internal + batch * BLAS_NODES + idx,
                            cur & (_BLAS_BIT - 1))
            if arity == 4:
                return _visit4(row, sp, hs, leafv, drops, bound, best_t)
            nf = _rec_fetch(nodes_f_ref, row, 16, interpret)
            # child entries ride lanes 12/13 of the same record as exact
            # f32 values (< 2^24) — ONE fetch per traversal step
            le = _ls(nf, 12).astype(jnp.int32)
            re = _ls(nf, 13).astype(jnp.int32)

            hl, tl = slab(_lv(nf, 0), _lv(nf, 1), _lv(nf, 2),
                          _lv(nf, 3), _lv(nf, 4), _lv(nf, 5), best_t)
            hr, tr = slab(_lv(nf, 6), _lv(nf, 7), _lv(nf, 8),
                          _lv(nf, 9), _lv(nf, 10), _lv(nf, 11), best_t)
            # ONE cross-lane reduction per child: the tile-min entry also
            # answers "any lane hit" (inf = none); the two lane-reduction
            # trees merge into one via a stacked (2,128) row (same trick
            # as _visit4)
            rl = jnp.min(jnp.where(hl, tl, jnp.inf), axis=0, keepdims=True)
            rr = jnp.min(jnp.where(hr, tr, jnp.inf), axis=0, keepdims=True)
            m2 = jnp.min(jnp.concatenate([rl, rr], axis=0), axis=1)
            minl, minr = m2[0], m2[1]

            # near-first by min entry distance over hitting lanes; leaf
            # children are candidates too (they ride the stack)
            l_first = minl <= minr
            near = jnp.where(l_first, le, re)
            far = jnp.where(l_first, re, le)
            near_t = jnp.where(l_first, minl, minr)
            far_t = jnp.where(l_first, minr, minl)
            near_ok = near_t < jnp.inf
            far_ok = far_t < jnp.inf

            # push far (with its tile-min entry for pop-time pruning).
            # UNCONDITIONAL store: invalid/overflow pushes land in the
            # trash slot at index STACK — a predicated read-modify-write
            # here measured ~350 ns/step (SMEM RMW + select; r4 bisect
            # RTRT_SURGERY=no_tstack), a plain store is near-free
            ok_push = near_ok & far_ok & (sp < STACK)
            c = ok_push.astype(jnp.int32)
            w = jnp.where(ok_push, sp, STACK)
            stack_ref[w] = far
            if not _NO_TSTACK:
                tstack_ref[w] = far_t
            drops = drops + (near_ok & far_ok & (c == 0)).astype(jnp.int32)
            sp = sp + c
            nxt = jnp.where(near_ok, near, jnp.int32(-1))
            return (sp,) + hs + (leafv, drops, bound, near_t, nxt)

        def visit(args):
            return jax.lax.cond((cur & _LEAF_BIT) != 0, visit_leaf,
                                visit_internal, args)

        def skip(args):
            # pruned pop: beyond every lane's best — drop it
            return args + (jnp.float32(jnp.inf), jnp.int32(-1))

        if _NO_PRUNE:  # timing-only surgery: every pop is a full visit
            out = visit((sp,) + hs + (leafv, drops, bound))
        else:
            out = jax.lax.cond(curt < bound, visit, skip,
                               (sp,) + hs + (leafv, drops, bound))
        sp = out[0]
        hs = out[1:1 + nh]
        leafv, drops, bound, curt, nxt = out[-5:]
        if any_hit:
            done = jnp.all((hs[1] >= 0) | (t_cap <= RAY_TMIN))
            sp = jnp.where(done, 0, sp)
            nxt = jnp.where(done, jnp.int32(-1), nxt)
        return (sp,) + hs + (steps + 1, leafv, drops, bound, curt, nxt)

    # (A fully branchless step — both bodies every iteration under scalar
    # masks, no lax.cond — was implemented and measured r5: 1206 ns/step
    # vs 804 for this cond form on the v5e.  The kernel is throughput-
    # bound, not cond-bound; the cond step stays.)
    out = jax.lax.while_loop(cond, step, init)
    hs = out[1:1 + nh]
    best_t, tri, uo, vo = hs[0:4]
    # telemetry plane: loop steps; accepted-leaf-visit events under
    # RTRT_COUNT=leaf; dropped far-child pushes (stack overflow — must
    # be 0 for a correct image) under RTRT_COUNT=drops
    _count = _os.environ.get("RTRT_COUNT", "")
    if _count == "leaf":
        steps = out[-5]
    elif _count == "drops":
        steps = out[-4]
    else:
        steps = out[-6]
    if lean:
        # Post-loop DISTINCT-WINNER attribute resolve: each iteration
        # extracts the smallest unresolved winning triangle index with a
        # cross-lane min (a ~1us vector->scalar sync), fetches its attr
        # record, and broadcast-selects into the lanes that chose it.
        # Iterations = |distinct winners| per tile.  (An accepted-leaf
        # SMEM replay log with sync-free iterations was measured SLOWER —
        # 369.6 vs 341.5 ms/frame terrain 1080p — because leaf-visit
        # entries outnumber distinct winners ~3.5x and per-iteration cost
        # is dominated by the record fetch either way; see ROADMAP.)
        # Per-lane any-hit (shadow) lanes are excluded: their hit only
        # carries an occlusion flag (tri >= 0), never attributes.
        imax = jnp.int32(2147483647)
        want = tri >= 0
        if first_hit is not None:
            want = want & ~first_hit
        pend0 = jnp.where(want, tri, imax)
        zi = jnp.zeros(shape, jnp.int32)

        def _attr_fetch2(lo, hi):
            """Fetch attr records lo and hi — straight from the VMEM table,
            or via two OVERLAPPED single-row DMAs when the attr table lives
            in HBM (attr_hbm: both starts issue before either wait, so one
            HBM round trip covers the pair)."""
            if not attr_hbm:
                if attr_pad:  # row-per-record: roll-free dynamic reads
                    return (attr_f_ref[pl.ds(lo, 1), :],
                            attr_f_ref[pl.ds(hi, 1), :])
                return (_rec_fetch(attr_f_ref, lo, 16, interpret),
                        _rec_fetch(attr_f_ref, hi, 16, interpret))
            per = 128 // 16
            cps = [pltpu.make_async_copy(
                       attr_f_ref.at[pl.ds(i // per, 1), :],
                       attr_scratch.at[pl.ds(k, 1), :], attr_sem.at[k])
                   for k, i in enumerate((lo, hi))]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

            def rot(k, i):
                row = attr_scratch[pl.ds(k, 1), :]
                sh = 16 * (i % per)
                if interpret:
                    return jnp.roll(row, -sh, axis=1)
                return pltpu.roll(row, jnp.where(sh == 0, 0, 128 - sh), 1)

            return rot(0, lo), rot(1, hi)

        def resolve_one(cand, a, s):
            pend, mat, nsx, nsy, nsz, ngx, ngy, ngz = s
            # ONE record fetch: shading normals (lanes 0-8), precomputed
            # geometric normal (9-11), material bits (12); all lanes stay
            # in the vector domain as (1,1) broadcasts
            am = _lv(a, 12).astype(jnp.int32)
            m = pend == cand
            # interpolated shading normal (record rows x winning bary)
            tw = 1.0 - uo - vo
            inx = tw * _lv(a, 0) + uo * _lv(a, 3) + vo * _lv(a, 6)
            iny = tw * _lv(a, 1) + uo * _lv(a, 4) + vo * _lv(a, 7)
            inz = tw * _lv(a, 2) + uo * _lv(a, 5) + vo * _lv(a, 8)
            return (jnp.where(m, imax, pend),
                    jnp.where(m, am, mat),
                    jnp.where(m, inx, nsx),
                    jnp.where(m, iny, nsy),
                    jnp.where(m, inz, nsz),
                    jnp.where(m, _lv(a, 9), ngx),
                    jnp.where(m, _lv(a, 10), ngy),
                    jnp.where(m, _lv(a, 11), ngz))

        # Dual-ended extraction: each iteration resolves BOTH the smallest
        # and the largest unresolved winner.  The min and max reductions
        # are independent (their vector->scalar syncs overlap), as are the
        # two record fetches, so one iteration latency buys two winners.
        # The max view uses -1 as its empty sentinel (max over imax-filled
        # pend would never terminate).
        def mx_of(pend):
            return jnp.max(jnp.where(pend == imax, -1, pend))

        st = (pend0, zi, zf(), zf(), zf(), zf(), zf(), zf())
        r0 = st + (jnp.min(pend0), mx_of(pend0), jnp.int32(0))

        def rcond(s):
            return s[-3] != imax

        def rstep(s):
            lo, hi = s[-3], s[-2]
            rlo, rhi = _attr_fetch2(lo, hi)
            nw = resolve_one(lo, rlo, s[:-3])
            # hi == lo when one winner remains: the second resolve is a
            # no-op re-fetch, never a corruption (its mask is empty)
            nw = resolve_one(hi, rhi, nw)
            return nw + (jnp.min(nw[0]), mx_of(nw[0]), s[-1] + 1)

        rout = jax.lax.while_loop(rcond, rstep, r0)
        mat, nsx, nsy, nsz, ngx, ngy, ngz = rout[1:8]
        if _os.environ.get("RTRT_COUNT") == "resolve":
            # telemetry: distinct-winner resolve iterations (dual-ended —
            # ~2 winners each) instead of traversal steps
            steps = rout[-1]
    else:
        mat, nsx, nsy, nsz, ngx, ngy, ngz = hs[4:11]
    return (jnp.where(tri >= 0, best_t, jnp.inf), tri, uo, vo, mat,
            nsx, nsy, nsz, ngx, ngy, ngz, steps)


def _kernel(nodes_f_ref, tris_ref, attr_f_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
            t_out, tri_out, u_out, v_out, mat_out,
            nsx_out, nsy_out, nsz_out, ngx_out, ngy_out, ngz_out,
            *, tlas_internal, any_hit, max_steps, arity=2, leaf_width=1,
            attr_hbm=False, attr_pad=False, node_pad=True, lean=False,
            count_steps=False, interpret=False):
    step0 = pl.program_id(0) == 0  # (before run_scoped: interpret mode
    #                                loses the grid context inside it)

    def run(stack_ref, tstack_ref, nodes_f_v, tris_v, attr_f_v, tdma_sem):
        # stage tables HBM->VMEM once at grid step 0 (Mosaic re-copies
        # pipelined whole-array VMEM inputs on EVERY step; ~2 s/frame at
        # 1080p — same staging as render/megakernel.py).  With attr_hbm
        # the attribute table stays in HBM; the resolve loop DMAs single
        # records through attr_f_v ((2,128) scratch rows).
        @pl.when(step0)
        def _copy_tables():
            pairs = [(nodes_f_ref, nodes_f_v), (tris_ref, tris_v)]
            if not attr_hbm:
                pairs.append((attr_f_ref, attr_f_v))
            for k, (src, dst) in enumerate(pairs):
                pltpu.make_async_copy(src, dst, tdma_sem.at[k]).start()
            for k, (src, dst) in enumerate(pairs):
                pltpu.make_async_copy(src, dst, tdma_sem.at[k]).wait()

        kw = dict(attr_hbm=True, attr_scratch=attr_f_v,
                  attr_sem=tdma_sem, lean=True) if attr_hbm \
            else dict(lean=lean, attr_pad=attr_pad)
        kw["node_pad"] = node_pad
        (t, tri, uo, vo, mat, nsx, nsy, nsz, ngx, ngy, ngz, stp) = traverse_tile(
            nodes_f_v, tris_v, attr_f_ref if attr_hbm else attr_f_v,
            stack_ref, tstack_ref, ox_ref[0], oy_ref[0], oz_ref[0],
            dx_ref[0], dy_ref[0], dz_ref[0], tmax_ref[0],
            tlas_internal=tlas_internal, any_hit=any_hit,
            max_steps=max_steps, arity=arity, leaf_width=leaf_width,
            interpret=interpret, **kw)
        t_out[0] = t
        tri_out[0] = tri
        u_out[0] = uo
        v_out[0] = vo
        # count_steps: telemetry plane for the standalone kernel (the
        # megakernel has its own debug_steps route) — the tile's loop
        # count rides the mat plane (tools/probe_traverse.py)
        mat_out[0] = jnp.full(t.shape, stp) if count_steps else mat
        nsx_out[0] = nsx
        nsy_out[0] = nsy
        nsz_out[0] = nsz
        ngx_out[0] = ngx
        ngy_out[0] = ngy
        ngz_out[0] = ngz

    pl.run_scoped(run, pltpu.SMEM((STACK + 1,), jnp.int32),
                  pltpu.SMEM((STACK + 1,), jnp.float32),
                  pltpu.VMEM(nodes_f_ref.shape, jnp.float32),
                  pltpu.VMEM(tris_ref.shape, jnp.float32),
                  pltpu.VMEM((2, 128) if attr_hbm else attr_f_ref.shape,
                             jnp.float32),
                  pltpu.SemaphoreType.DMA((3,)))



class PacketHit(NamedTuple):
    """Packet-kernel result incl. in-kernel surface attributes."""

    t: jnp.ndarray     # (N,) inf on miss
    tri: jnp.ndarray   # (N,) i32 sorted tri id, -1 on miss
    u: jnp.ndarray     # (N,) barycentric of v1
    v: jnp.ndarray     # (N,) barycentric of v2
    mat: jnp.ndarray   # (N,) i32 material id
    ns: jnp.ndarray    # (N,3) interpolated shading normal (unnormalized)
    ng: jnp.ndarray    # (N,3) geometric normal (unit, unoriented)


def packet_intersect(tables: PacketTables, org, dir, t_max=None, *,
                     any_hit=False, max_steps=PACKET_MAX_STEPS,
                     tlas_internal, arity=2, leaf_width=1, attr_hbm=False,
                     attr_pad=False, node_pad=True, lean=False,
                     count_steps=False, interpret=False) -> PacketHit:
    """Trace (N,3) rays with the packet kernel.  Pads N up to a TILE
    multiple internally (pad rays carry t_max=0 and terminate instantly)."""
    n0 = org.shape[0]
    if t_max is None:
        t_max = jnp.full((n0,), jnp.inf, jnp.float32)
    pad = (-n0) % TILE
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        dir = jnp.concatenate(
            [dir, jnp.tile(jnp.array([[1.0, 0.0, 0.0]], dir.dtype), (pad, 1))])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    n = org.shape[0]
    nt = n // TILE

    def shape(x):
        return x.reshape(nt * TILE_SHAPE[0], 128)

    comp = [shape(org[:, 0]), shape(org[:, 1]), shape(org[:, 2]),
            shape(dir[:, 0]), shape(dir[:, 1]), shape(dir[:, 2]),
            shape(t_max)]

    kernel = functools.partial(_kernel, tlas_internal=tlas_internal,
                               any_hit=any_hit, max_steps=max_steps,
                               arity=arity, leaf_width=leaf_width,
                               attr_hbm=attr_hbm, attr_pad=attr_pad,
                               node_pad=node_pad, lean=lean,
                               count_steps=count_steps, interpret=interpret)
    grid = (nt,)
    ray_spec = pl.BlockSpec((1,) + TILE_SHAPE, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    # big tables arrive in ANY (HBM) and are staged into VMEM scratch once
    # at grid step 0 inside the kernel (pipelined whole-array VMEM inputs
    # are re-copied from HBM on EVERY grid step — ~2 s/frame at 1080p)
    table_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3

    f32s = jax.ShapeDtypeStruct((nt,) + TILE_SHAPE, jnp.float32)
    i32s = jax.ShapeDtypeStruct((nt,) + TILE_SHAPE, jnp.int32)
    out_shapes = [f32s, i32s, f32s, f32s, i32s,
                  f32s, f32s, f32s, f32s, f32s, f32s]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=table_specs + [ray_spec] * 7,
        out_specs=[ray_spec] * 11,
        out_shape=out_shapes,
        interpret=interpret,
    )(tables.nodes_f32, tables.tris_f32, tables.attr_f32,
      *[c.reshape((nt,) + TILE_SHAPE) for c in comp])
    t, tri, u, v, mat, nsx, nsy, nsz, ngx, ngy, ngz = \
        [o.reshape(n)[:n0] for o in outs]
    return PacketHit(t, tri, u, v, mat,
                     jnp.stack([nsx, nsy, nsz], axis=-1),
                     jnp.stack([ngx, ngy, ngz], axis=-1))
