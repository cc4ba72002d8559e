#!/usr/bin/env python3
"""Offline mesh baker: import -> morton-sort -> binary scene cache.

Counterpart of the reference's meshProcessor tool
(reference: tool/meshProcessor.cpp — assimp import, 60-bit morton codes
:52, CPU sort, `.bin` output consumed at src/init.cu:28-50).  Uses the
native C++ 63-bit morton sorter when built, numpy otherwise; output is the
framework's .npz scene cache (content/meshio.py).

Usage: python tools/mesh_baker.py input.obj output.npz [--subdivide N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def morton_sort_numpy(v0, v1, v2):
    """63-bit morton centroid sort (python fallback)."""
    c = (v0 + v1 + v2) / 3.0
    lo = c.min(0)
    ext = np.maximum(c.max(0) - lo, 1e-12)
    q = np.clip(((c - lo) / ext * 2097151.0), 0, 2097151).astype(np.uint64)

    def expand(x):
        x &= np.uint64(0x1FFFFF)
        x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
        return x

    codes = (expand(q[:, 0]) << np.uint64(2)) | (expand(q[:, 1]) << np.uint64(1)) \
        | expand(q[:, 2])
    order = np.argsort(codes, kind="stable")
    return v0[order], v1[order], v2[order]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--subdivide", type=int, default=0,
                   help="Loop-subdivision levels before baking")
    p.add_argument("--weld-tol", type=float, default=1e-5)
    args = p.parse_args()

    from rtrt_tpu.content import native
    from rtrt_tpu.content.marching import smooth_normals, weld_vertices
    from rtrt_tpu.content.meshio import load_mesh, save_mesh_cache

    verts, faces = load_mesh(args.input)
    print(f"loaded {args.input}: {len(verts)} verts, {len(faces)} tris")

    if args.subdivide:
        if native.available():
            verts, faces = native.subdivide_loop(verts, faces, args.subdivide)
        else:
            from rtrt_tpu.content.halfedge import HalfedgeMesh
            m = HalfedgeMesh.from_triangles(verts, faces)
            for _ in range(args.subdivide):
                m.subdivide("loop")
            verts, faces = m.to_triangles()
        print(f"subdivided x{args.subdivide}: {len(verts)} verts, "
              f"{len(faces)} tris")

    # morton-sort the triangle soup for traversal locality, then re-weld
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    if native.available():
        v0, v1, v2 = native.morton_sort_tris(v0, v1, v2)
        verts, faces = native.weld(v0, v1, v2, args.weld_tol)
    else:
        v0, v1, v2 = morton_sort_numpy(v0, v1, v2)
        verts, faces = weld_vertices(v0, v1, v2, args.weld_tol)

    save_mesh_cache(args.output, verts, faces)
    print(f"wrote {args.output}: {len(verts)} verts, {len(faces)} tris "
          f"(native={native.available()})")


if __name__ == "__main__":
    main()
