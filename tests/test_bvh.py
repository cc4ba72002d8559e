"""LBVH build + traversal tests against CPU oracles.

Mirrors the reference's CSV-dump verification points (reference:
src/bvh.cu:15-96 dumps morton/reorder/aabb/node intermediates) plus the
property test the reference lacks: BVH closest hit == brute-force closest hit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtrt_tpu.bvh.build import build_scene_bvh, lbvh_topology
from rtrt_tpu.bvh.traverse import intersect_brute, occluded
from rtrt_tpu.bvh.traverse import intersect_scene as _intersect_eager
from rtrt_tpu.bvh.types import BATCH_SIZE
from rtrt_tpu.core.vecmath import normalize
from functools import partial

build_jit = jax.jit(build_scene_bvh)
topo_jit = jax.jit(lbvh_topology)


@partial(jax.jit, static_argnames=("max_steps",))
def intersect_scene(bvh, org, dirs, max_steps=1024):
    return _intersect_eager(bvh, org, dirs, max_steps=max_steps)


occluded_jit = jax.jit(occluded)


# ---------------------------------------------------------------------------
# topology oracle: recursive CPU Karras build
# ---------------------------------------------------------------------------


def _cpu_lcp(codes, i, j):
    n = len(codes)
    if j < 0 or j >= n:
        return -1
    x = int(codes[i]) ^ int(codes[j])
    if x == 0:
        return 32 + (32 - ((i ^ j).bit_length()))
    return 32 - x.bit_length()


def _cpu_karras(codes):
    """Reference-free recursive construction: split each leaf range at the
    point of the largest morton-prefix change (identical tree definition)."""
    n = len(codes)
    left = np.zeros(n - 1, np.int64)
    right = np.zeros(n - 1, np.int64)
    first = np.zeros(n - 1, np.int64)
    last = np.zeros(n - 1, np.int64)

    for i in range(n - 1):
        d = 1 if _cpu_lcp(codes, i, i + 1) >= _cpu_lcp(codes, i, i - 1) else -1
        dmin = _cpu_lcp(codes, i, i - d)
        lmax = 2
        while _cpu_lcp(codes, i, i + lmax * d) > dmin:
            lmax *= 2
        l = 0
        t = lmax // 2
        while t >= 1:
            if _cpu_lcp(codes, i, i + (l + t) * d) > dmin:
                l += t
            t //= 2
        j = i + l * d
        dnode = _cpu_lcp(codes, i, j)
        s = 0
        t = l
        while True:
            t = (t + 1) // 2
            if _cpu_lcp(codes, i, i + (s + t) * d) > dnode:
                s += t
            if t == 1:
                break
        gamma = i + s * d + min(d, 0)
        first[i], last[i] = min(i, j), max(i, j)
        left[i] = ~gamma if first[i] == gamma else gamma
        right[i] = ~(gamma + 1) if last[i] == gamma + 1 else gamma + 1
    return left, right, first, last


@pytest.mark.parametrize("n,seed,dup", [(8, 0, 0), (64, 1, 0), (256, 2, 0),
                                        (128, 3, 1), (1024, 4, 1)])
def test_topology_vs_oracle(n, seed, dup):
    """Element-exact vs the recursive CPU Karras build; dup=1 draws from a
    tiny code alphabet so long duplicate runs exercise the index-XOR
    extended-delta path (and n=1024 is the real BLAS batch size)."""
    rng = np.random.default_rng(seed)
    hi = 17 if dup else 2**30
    codes = np.sort(rng.integers(0, hi, n, dtype=np.uint32))
    l, r, f, la = (np.asarray(x) for x in topo_jit(jnp.asarray(codes)))
    cl, cr, cf, cla = _cpu_karras(codes)
    assert (l == cl).all()
    assert (r == cr).all()
    assert (f == cf).all()
    assert (la == cla).all()


def test_topology_duplicate_codes():
    codes = np.array([5, 5, 5, 5, 9, 9, 20, 20], dtype=np.uint32)
    l, r, f, la = (np.asarray(x) for x in topo_jit(jnp.asarray(codes)))
    # every leaf must appear exactly once as a leaf child
    leaves = sorted([~x for x in np.concatenate([l, r]) if x < 0])
    assert leaves == list(range(8))
    # root (node 0) covers everything
    assert f[0] == 0 and la[0] == 7


def test_topology_is_connected_tree():
    rng = np.random.default_rng(7)
    codes = np.sort(rng.integers(0, 2**30, 128, dtype=np.uint32))
    l, r, _, _ = (np.asarray(x) for x in topo_jit(jnp.asarray(codes)))
    seen_internal = np.zeros(127, bool)
    seen_leaf = np.zeros(128, bool)
    stack = [0]
    seen_internal[0] = True
    while stack:
        i = stack.pop()
        for c in (l[i], r[i]):
            if c < 0:
                assert not seen_leaf[~c]
                seen_leaf[~c] = True
            else:
                assert not seen_internal[c]
                seen_internal[c] = True
                stack.append(c)
    assert seen_internal.all() and seen_leaf.all()


# ---------------------------------------------------------------------------
# full scene build + traversal
# ---------------------------------------------------------------------------


def _random_tri_soup(rng, num_tris, extent=10.0):
    c = rng.uniform(-extent, extent, (num_tris, 3)).astype(np.float32)
    e1 = rng.uniform(-0.5, 0.5, (num_tris, 3)).astype(np.float32)
    e2 = rng.uniform(-0.5, 0.5, (num_tris, 3)).astype(np.float32)
    return c, c + e1, c + e2


def _pad_batches(v0, v1, v2, num_batches=2):
    n = v0.shape[0]
    total = num_batches * BATCH_SIZE
    pad = total - n
    z = np.zeros((pad, 3), np.float32)
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    stack = lambda a: jnp.asarray(np.concatenate([a, z]).reshape(num_batches, BATCH_SIZE, 3))
    return stack(v0), stack(v1), stack(v2), jnp.asarray(valid.reshape(num_batches, BATCH_SIZE))


def test_build_and_closest_hit_vs_brute(rng):
    v0, v1, v2 = _random_tri_soup(rng, 700)
    bv0, bv1, bv2, valid = _pad_batches(v0, v1, v2, 2)
    bvh = build_jit(bv0, bv1, bv2, valid)

    nrays = 512
    org = jnp.asarray(rng.uniform(-15, 15, (nrays, 3)).astype(np.float32))
    dirs = normalize(jnp.asarray(rng.normal(size=(nrays, 3)).astype(np.float32)))

    # random soup is the LBVH worst case — rays can visit nearly every node,
    # so lift the step cap for the exhaustive-correctness property test
    hit = intersect_scene(bvh, org, dirs, max_steps=16384)
    valid_sorted = np.asarray(valid.reshape(-1))[np.asarray(bvh.sorted_tri_index)]
    brute = intersect_brute(org, dirs, bvh.tri_v0, bvh.tri_v1, bvh.tri_v2,
                            valid=jnp.asarray(valid_sorted))

    ht, bt = np.asarray(hit.t), np.asarray(brute.t)
    both_hit = np.isfinite(ht) & np.isfinite(bt)
    same_miss = ~np.isfinite(ht) & ~np.isfinite(bt)
    assert (both_hit | same_miss).mean() > 0.999
    np.testing.assert_allclose(ht[both_hit], bt[both_hit], rtol=1e-4, atol=1e-4)
    # matching triangle ids wherever t matches uniquely
    tri_match = (np.asarray(hit.tri) == np.asarray(brute.tri))[both_hit]
    assert tri_match.mean() > 0.99  # coplanar ties may differ


def _grid_mesh(nx=24, nz=24, scale=1.0):
    """Coherent heightfield mesh — the realistic LBVH workload (default cap)."""
    xs = np.linspace(-5, 5, nx + 1).astype(np.float32)
    zs = np.linspace(-5, 5, nz + 1).astype(np.float32)
    xx, zz = np.meshgrid(xs, zs, indexing="ij")
    yy = (np.sin(xx) * np.cos(zz) * scale).astype(np.float32)
    p = np.stack([xx, yy, zz], -1)
    v0, v1, v2 = [], [], []
    for i in range(nx):
        for j in range(nz):
            a, b, c, dd = p[i, j], p[i + 1, j], p[i + 1, j + 1], p[i, j + 1]
            v0 += [a, a]
            v1 += [b, c]
            v2 += [c, dd]
    return (np.stack(v0), np.stack(v1), np.stack(v2))


def test_grid_mesh_default_cap(rng):
    """A coherent mesh must resolve fully within the reference's 1024-step
    traversal budget (reference: src/traverse.h:132)."""
    v0, v1, v2 = _grid_mesh()
    bv0, bv1, bv2, valid = _pad_batches(v0, v1, v2, 2)
    bvh = build_jit(bv0, bv1, bv2, valid)
    nrays = 256
    org = jnp.asarray(rng.uniform(-4, 4, (nrays, 3)).astype(np.float32) * np.array([1, 0, 1], np.float32) + np.array([0, 6, 0], np.float32))
    # downward-ish rays at the surface
    dirs = normalize(jnp.asarray(
        rng.normal(size=(nrays, 3)).astype(np.float32) * np.array([0.3, 1, 0.3], np.float32)
        - np.array([0, 1.0, 0], np.float32)))
    hit = intersect_scene(bvh, org, dirs)
    valid_sorted = np.asarray(valid.reshape(-1))[np.asarray(bvh.sorted_tri_index)]
    brute = intersect_brute(org, dirs, bvh.tri_v0, bvh.tri_v1, bvh.tri_v2,
                            valid=jnp.asarray(valid_sorted))
    ht, bt = np.asarray(hit.t), np.asarray(brute.t)
    assert (np.isfinite(ht) == np.isfinite(bt)).all()
    m = np.isfinite(ht)
    np.testing.assert_allclose(ht[m], bt[m], rtol=1e-4, atol=1e-4)


def test_multi_batch_scene(rng):
    v0, v1, v2 = _random_tri_soup(rng, 3000, extent=20.0)
    bv0, bv1, bv2, valid = _pad_batches(v0, v1, v2, 4)
    bvh = build_jit(bv0, bv1, bv2, valid)
    assert bvh.num_batches == 4
    assert bvh.tlas_internal == 3

    nrays = 256
    org = jnp.asarray(rng.uniform(-25, 25, (nrays, 3)).astype(np.float32))
    dirs = normalize(jnp.asarray(rng.normal(size=(nrays, 3)).astype(np.float32)))
    hit = intersect_scene(bvh, org, dirs, max_steps=16384)
    valid_sorted = np.asarray(valid.reshape(-1))[np.asarray(bvh.sorted_tri_index)]
    brute = intersect_brute(org, dirs, bvh.tri_v0, bvh.tri_v1, bvh.tri_v2,
                            valid=jnp.asarray(valid_sorted))
    ht, bt = np.asarray(hit.t), np.asarray(brute.t)
    ok = (np.isfinite(ht) == np.isfinite(bt))
    assert ok.mean() > 0.999
    m = np.isfinite(ht) & np.isfinite(bt)
    np.testing.assert_allclose(ht[m], bt[m], rtol=1e-4, atol=1e-4)


def test_occlusion(rng):
    # single large triangle as a wall at z=0
    big = 100.0
    v0 = np.array([[-big, -big, 0.0]], np.float32)
    v1 = np.array([[big, -big, 0.0]], np.float32)
    v2 = np.array([[0.0, big, 0.0]], np.float32)
    bv0, bv1, bv2, valid = _pad_batches(v0, v1, v2, 2)
    bvh = build_jit(bv0, bv1, bv2, valid)

    org = jnp.asarray(np.array([[0.0, 0.0, -5.0], [0.0, 0.0, -5.0]], np.float32))
    dirs = jnp.asarray(np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], np.float32))
    t_max = jnp.full((2,), 100.0)
    occ = np.asarray(occluded_jit(bvh, org, dirs, t_max))
    assert occ[0] and not occ[1]
    # occlusion respects t_max shorter than the blocker distance
    occ2 = np.asarray(occluded_jit(bvh, org, dirs, jnp.full((2,), 1.0)))
    assert not occ2[0]


def test_empty_scene_rays_miss(rng):
    v0 = np.zeros((1, 3), np.float32)  # one degenerate tri, marked invalid
    bv0, bv1, bv2, valid = _pad_batches(v0, v0, v0, 2)
    valid = jnp.zeros_like(valid)
    bvh = build_jit(bv0, bv1, bv2, valid)
    org = jnp.zeros((4, 3))
    dirs = normalize(jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)))
    hit = intersect_scene(bvh, org, dirs)
    assert (np.asarray(hit.tri) == -1).all()
