"""Two-level BVH traversal as a vectorized wavefront loop.

TPU-native counterpart of the reference's stack traversal
(reference: src/traverse.h:107-253 TraverseBvh, src/traverse.cuh:64-226
RaySceneIntersect).  Instead of one divergent SIMT thread per ray, ALL rays
step in lockstep through a masked `lax.while_loop`:

  * every ray holds a packed int32 "current node" + a 16-deep stack pair
    (entry, t) (reference stack: src/traverse.h:9-86);
  * each iteration does ONE flat gather of a node row (12-float child-AABB
    pair + 2 packed children — the AABBCompact amortization of
    src/geometry.cuh:603), a pair slab test, and — when children are leaves —
    watertight triangle tests INLINE in the same iteration, so leaf entries
    never consume stack slots or loop trips;
  * pops scan the whole 16-wide t-stack at once and jump straight to the
    topmost non-pruned entry: t-pruned entries are skipped in ZERO iterations
    (the reference pops/skips one per loop, src/traverse.h:88-105);
  * TLAS->BLAS transitions cost nothing: TLAS leaf children were pre-resolved
    to BLAS roots at build time (see build.py), so the stack only ever holds
    internal nodes.

The loop runs until every lane is done or `max_steps` (reference cap 1024,
src/traverse.h:132; one of our iterations does strictly more work than one
reference iteration).  Worst-lane dominance is the known cost of lockstep
traversal; ray sorting/compaction between bounces (integrator-level) and a
VMEM-resident Pallas variant are the planned mitigations.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.geometry import (RAY_TMIN, make_ray_aux, ray_aabb_pair,
                             ray_triangle_watertight)
from .types import (BATCH_SIZE, BLAS_NODES, ENTRY_INVALID, STACK_DEPTH,
                    MAX_TRAVERSAL_STEPS, SceneBvh, entry_batch, entry_idx,
                    entry_is_blas, entry_is_leaf)


class Hit(NamedTuple):
    """Closest-hit result (sorted-order triangle ids; -1 = miss)."""

    t: jnp.ndarray        # (N,) f32, +inf on miss
    tri: jnp.ndarray      # (N,) i32 sorted triangle id, -1 on miss
    u: jnp.ndarray        # (N,) barycentric of v1
    v: jnp.ndarray        # (N,) barycentric of v2


def intersect_scene(bvh: SceneBvh, org, dir, t_max=None, *, any_hit=False,
                    max_steps=MAX_TRAVERSAL_STEPS) -> Hit:
    """Trace rays against the scene.  org/dir: (N,3); t_max: (N,) or None.

    With any_hit=True the loop terminates a lane at its first accepted hit
    (shadow-ray occlusion; t/tri then report that hit, not the closest).
    """
    n = org.shape[0]
    aux = make_ray_aux(dir)
    inv_dir = aux.inv_dir
    tlas_internal = bvh.tlas_internal

    if t_max is None:
        t_max = jnp.full((n,), jnp.inf, jnp.float32)

    slot = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :]  # (1,D)
    root = jnp.zeros((n,), jnp.int32)  # packed TLAS node 0

    init = dict(
        cur=root,
        sp=jnp.zeros((n,), jnp.int32),
        istack=jnp.full((n, STACK_DEPTH), ENTRY_INVALID, jnp.int32),
        tstack=jnp.full((n, STACK_DEPTH), jnp.inf, jnp.float32),
        best_t=t_max.astype(jnp.float32),
        best_tri=jnp.full((n,), -1, jnp.int32),
        best_u=jnp.zeros((n,), jnp.float32),
        best_v=jnp.zeros((n,), jnp.float32),
        steps=jnp.int32(0),
    )

    def cond(s):
        alive = (s["cur"] != ENTRY_INVALID) | (s["sp"] > 0)
        return (s["steps"] < max_steps) & jnp.any(alive)

    def body(s):
        cur = s["cur"]
        best_t = s["best_t"]
        best_tri = s["best_tri"]
        best_u = s["best_u"]
        best_v = s["best_v"]
        valid = cur != ENTRY_INVALID

        # ---- fetch node row (the stack holds internal nodes only) ----
        blas = entry_is_blas(cur)
        idx = entry_idx(cur)
        batch = entry_batch(cur)
        row = jnp.where(blas, tlas_internal + batch * BLAS_NODES + idx, idx)
        row = jnp.where(valid, row, 0)
        boxes = bvh.flat_boxes[row]        # (N,12)
        children = bvh.flat_children[row]  # (N,2)

        hl, tl, hr, tr = ray_aabb_pair(org, inv_dir, boxes, RAY_TMIN, best_t)
        hl = hl & valid
        hr = hr & valid
        le, re = children[:, 0], children[:, 1]
        l_leaf = entry_is_leaf(le)
        r_leaf = entry_is_leaf(re)

        # ---- leaf children: watertight triangle tests inline ----
        for child, chit, cleaf in ((le, hl, l_leaf), (re, hr, r_leaf)):
            do = chit & cleaf
            tri_idx = entry_batch(child) * BATCH_SIZE + entry_idx(child)
            g = jnp.where(do, tri_idx, 0)
            th = ray_triangle_watertight(org, aux, bvh.tri_v0[g],
                                         bvh.tri_v1[g], bvh.tri_v2[g],
                                         RAY_TMIN, best_t)
            better = do & th.hit & (th.t < best_t)
            best_t = jnp.where(better, th.t, best_t)
            best_tri = jnp.where(better, tri_idx, best_tri)
            best_u = jnp.where(better, th.u, best_u)
            best_v = jnp.where(better, th.v, best_v)

        # ---- internal children: near-first descent, far pushed ----
        lh = hl & ~l_leaf
        rh = hr & ~r_leaf
        both = lh & rh
        near_is_l = tl <= tr
        near_e = jnp.where(near_is_l, le, re)
        far_e = jnp.where(near_is_l, re, le)
        far_t = jnp.maximum(tl, tr)

        push = both & (s["sp"] < STACK_DEPTH)  # overflow: drop far child
        onehot = push[:, None] & (slot == s["sp"][:, None])
        istack = jnp.where(onehot, far_e[:, None], s["istack"])
        tstack = jnp.where(onehot, far_t[:, None], s["tstack"])
        sp = s["sp"] + push.astype(jnp.int32)

        nxt = jnp.where(both, near_e,
                        jnp.where(lh, le, jnp.where(rh, re, ENTRY_INVALID)))

        if any_hit:
            found = best_tri >= 0
            nxt = jnp.where(found, ENTRY_INVALID, nxt)
            sp = jnp.where(found, 0, sp)

        # ---- t-pruned pop: jump straight to the topmost live entry ----
        need_pop = (nxt == ENTRY_INVALID) & (sp > 0)
        live = (slot < sp[:, None]) & (tstack < best_t[:, None])  # (N,D)
        top = jnp.max(jnp.where(live, slot + 1, 0), axis=1)  # 0 = stack empty
        sp2 = jnp.maximum(top - 1, 0)
        popped_e = jnp.take_along_axis(istack, sp2[:, None], axis=1)[:, 0]
        accept = need_pop & (top > 0)
        nxt = jnp.where(accept, popped_e, nxt)
        sp = jnp.where(need_pop, jnp.where(top > 0, sp2, 0), sp)

        return dict(cur=nxt, sp=sp, istack=istack, tstack=tstack,
                    best_t=best_t, best_tri=best_tri, best_u=best_u,
                    best_v=best_v, steps=s["steps"] + 1)

    out = jax.lax.while_loop(cond, body, init)
    miss = out["best_tri"] < 0
    return Hit(jnp.where(miss, jnp.inf, out["best_t"]), out["best_tri"],
               out["best_u"], out["best_v"])


def occluded(bvh: SceneBvh, org, dir, t_max, max_steps=MAX_TRAVERSAL_STEPS):
    """Any-hit occlusion query: True where a blocker exists within t_max."""
    h = intersect_scene(bvh, org, dir, t_max, any_hit=True, max_steps=max_steps)
    return h.tri >= 0


def intersect_brute(org, dir, v0, v1, v2, valid=None, t_max=None) -> Hit:
    """O(N_rays * N_tris) closest-hit oracle for tests (uses the same
    watertight test so results are bit-comparable)."""
    n = org.shape[0]
    aux = make_ray_aux(dir)
    if t_max is None:
        t_max = jnp.full((n,), jnp.inf, jnp.float32)

    th = ray_triangle_watertight(
        org[:, None, :],
        jax.tree_util.tree_map(
            lambda x: x[:, None] if x.ndim == 1 else x[:, None, :], aux),
        v0[None], v1[None], v2[None], RAY_TMIN, t_max[:, None])
    t = th.t
    if valid is not None:
        t = jnp.where(valid[None, :], t, jnp.inf)
    best = jnp.argmin(t, axis=1).astype(jnp.int32)
    bt = jnp.take_along_axis(t, best[:, None], 1)[:, 0]
    miss = ~jnp.isfinite(bt)
    bu = jnp.take_along_axis(th.u, best[:, None], 1)[:, 0]
    bv = jnp.take_along_axis(th.v, best[:, None], 1)[:, 0]
    return Hit(jnp.where(miss, jnp.inf, bt), jnp.where(miss, -1, best), bu, bv)
