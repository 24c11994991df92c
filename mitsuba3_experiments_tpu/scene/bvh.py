"""BVH construction: Morton-ordered implicit balanced binary tree.

TPU-native replacement for the OptiX/Embree acceleration structures the
reference relies on (scene.ray_intersect at /root/reference/path.py:238).
Design rationale (SURVEY.md hard part #1): traversal cost on TPU is dominated
by gathers, so the tree is laid out *implicitly* — leaves are fixed-size
chunks of the Morton-sorted primitive array, internal node i has children
2i+1/2i+2 — which removes child-pointer gathers entirely and makes the build
a chain of vectorized reshapes + min/max reductions (no recursion, no host
loop over primitives; build time is O(F log F) numpy sort + O(F) reduces).
"""
from __future__ import annotations

import numpy as np

from .types import BVH


def _expand_bits(v):
    """Spread the lower 10 bits of v over 30 bits (every 3rd position)."""
    v = (v * np.uint64(0x00010001)) & np.uint64(0xFF0000FF)
    v = (v * np.uint64(0x00000101)) & np.uint64(0x0F00F00F)
    v = (v * np.uint64(0x00000011)) & np.uint64(0xC30C30C3)
    v = (v * np.uint64(0x00000005)) & np.uint64(0x49249249)
    return v


def morton3(p01):
    """p01: (N, 3) in [0,1] -> 30-bit Morton codes (N,) uint64."""
    q = np.clip(p01 * 1024.0, 0, 1023).astype(np.uint64)
    return (
        (_expand_bits(q[:, 0]) << np.uint64(2))
        | (_expand_bits(q[:, 1]) << np.uint64(1))
        | _expand_bits(q[:, 2])
    )


def build_bvh(vertices: np.ndarray, faces: np.ndarray, leaf_size: int = 4) -> BVH:
    """Build the implicit BVH (numpy, host side).

    vertices: (V, 3) f32; faces: (F, 3) i32.  Returns a BVH with
    2*n_leaves-1 nodes where n_leaves = next_pow2(ceil(F / leaf_size)).
    """
    import jax.numpy as jnp

    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int64)
    F = f.shape[0]
    tri = v[f]                                  # (F, 3, 3)
    lo = tri.min(axis=1)                        # (F, 3)
    hi = tri.max(axis=1)
    centroid = 0.5 * (lo + hi)

    scene_lo = lo.min(axis=0)
    scene_hi = hi.max(axis=0)
    extent = np.maximum(scene_hi - scene_lo, 1e-9)
    codes = morton3((centroid - scene_lo) / extent)
    order = np.argsort(codes, kind="stable").astype(np.int32)

    n_leaves_needed = -(-F // leaf_size)
    n_leaves = 1 << max(0, int(np.ceil(np.log2(max(n_leaves_needed, 1)))))
    n_prims_padded = n_leaves * leaf_size

    prim_order = np.full(n_prims_padded, -1, np.int32)
    prim_order[:F] = order

    # Leaf bounds: segment min/max over ordered prims; padded slots inverted.
    big = np.float32(np.finfo(np.float32).max)
    plo = np.full((n_prims_padded, 3), big, np.float32)
    phi = np.full((n_prims_padded, 3), -big, np.float32)
    plo[:F] = lo[order]
    phi[:F] = hi[order]
    leaf_lo = plo.reshape(n_leaves, leaf_size, 3).min(axis=1)
    leaf_hi = phi.reshape(n_leaves, leaf_size, 3).max(axis=1)

    # Internal levels bottom-up: level k has n_leaves >> k nodes.
    n_nodes = 2 * n_leaves - 1
    bounds_lo = np.empty((n_nodes, 3), np.float32)
    bounds_hi = np.empty((n_nodes, 3), np.float32)
    bounds_lo[n_leaves - 1 :] = leaf_lo
    bounds_hi[n_leaves - 1 :] = leaf_hi
    cur_lo, cur_hi = leaf_lo, leaf_hi
    first = n_leaves - 1
    while cur_lo.shape[0] > 1:
        cur_lo = cur_lo.reshape(-1, 2, 3).min(axis=1)
        cur_hi = cur_hi.reshape(-1, 2, 3).max(axis=1)
        first = first // 2
        bounds_lo[first : first + cur_lo.shape[0]] = cur_lo
        bounds_hi[first : first + cur_hi.shape[0]] = cur_hi

    return BVH(
        bounds_lo=jnp.asarray(bounds_lo),
        bounds_hi=jnp.asarray(bounds_hi),
        prim_order=jnp.asarray(prim_order),
        n_leaves=int(n_leaves),
        leaf_size=int(leaf_size),
    )
