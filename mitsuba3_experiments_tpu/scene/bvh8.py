"""8-wide BVH: collapse of the binary SAH tree into packed-row tables.

Motivation (BENCH.md): traversal on this TPU is gather-latency bound
(~0.1-0.35 ms per gather regardless of size), so the wide layout packs
everything one traversal step needs into a single row:

  nodes    (NN8, 64) f32 — [0:8]  child codes (bitcast int32:
                                   >=0 internal node row; -1 empty;
                                   <=-2 leaf row = -code-2)
                           [8:56] 8 x (lo.xyz | hi.xyz) child bounds
                           [56:64] pad
  leafs (L, ROW) f32    —  [0:9*LEAF_CAP] packed triangle vertices;
                           [..:FACE_OFF] pad; [FACE_OFF:ROW] global face
                           ids (bitcast i32, -1 padding — padded slots
                           hold degenerate all-zero triangles that never
                           hit).  LEAF_CAP=8 gives the historical
                           [0:72 | 72:80 pad | 80:88] = 88-float row.

One internal step = ONE row gather + pure VPU 8-box slab tests; one leaf
step = ONE row gather + LEAF_CAP unrolled VPU triangle tests.
Tree depth ~ log8 -> ~3x fewer lockstep iterations than the binary tree.

Because per-lane row gathers on this TPU are latency-bound and
width-independent (BENCH.md), LEAF_CAP is the iterations-per-ray knob:
doubling it halves leaf rows (and shaves tree depth) at the cost of wider
rows (~free) and more unrolled VPU triangle tests per iteration.
Override with env M3T_LEAF_CAP for A/B runs; layout derives from it.
"""
from __future__ import annotations

import os

import numpy as np

from .types import BVH

WIDTH = int(os.environ.get("M3T_BVH_WIDTH", "8"))
LEAF_CAP = int(os.environ.get("M3T_LEAF_CAP", "8"))
# face ids live past the vertex block, 8-aligned with >=1 float of pad
# (exactly the historical 72->80 offset at LEAF_CAP=8)
VERT_FLOATS = 9 * LEAF_CAP
FACE_OFF = (VERT_FLOATS // 8 + 1) * 8
LEAF_ROW = FACE_OFF + LEAF_CAP
# node row: WIDTH child codes (8-aligned block) then WIDTH x 6 bounds
# (historical 8 + 48 = 64-float row at WIDTH=8)
NODE_BASE = ((WIDTH + 7) // 8) * 8
NODE_ROW = ((NODE_BASE + 6 * WIDTH + 7) // 8) * 8
EMPTY = -1
# Traversal stack capacity (intersect/bvh_jax.py uses the same constant).
# Worst-case stack usage is tree_depth * (WIDTH - 1); collapse_to_wide
# raises at build time if that could exceed the stack (ADVICE round 1:
# silent overflow would drop subtrees -> missed hits).  The 2M-tri
# flagship collapses to depth 10 -> 70 slots; 80 leaves headroom and the
# shift-register stack's cost is streaming bandwidth, ~linear in depth.
STACK_DEPTH = int(os.environ.get(
    "M3T_STACK_DEPTH", "80" if WIDTH == 8 else str(8 * (WIDTH - 1))
))


def collapse_to_wide(lo, hi, left, right, first, count, prim_order,
                     tri_verts_flat, faces_global):
    """Binary SAH arrays -> packed wide tables (host, numpy + python loop).

    tri_verts_flat: (F, 9) f32 triangle vertices in prim_order slot order.
    faces_global:   (F,) i32 global face id per slot.
    """
    n_bin = left.shape[0]

    wide_children: list[list[int]] = []   # entries: +node / ~leaf refs
    leaf_rows: list[tuple[int, int]] = []  # (first, count) per leaf row

    # map binary node -> wide code, built iteratively
    # collapse: take a binary internal node, expand the child set until
    # WIDTH subtrees (preferring to expand internal children), children that
    # are binary leaves become leaf rows.
    def make_leaf(b):
        leaf_rows.append((int(first[b]), int(count[b])))
        return -(len(leaf_rows) - 1) - 2

    wide_of_binary = {}
    order = [0]
    codes = {}
    # BFS allocate wide rows for binary internal nodes reachable as subtree
    # roots after collapse
    queue = [0]
    while queue:
        b = queue.pop()
        if b in wide_of_binary:
            continue
        if left[b] == -1:
            continue  # handled by parent as leaf
        wid = len(wide_children)
        wide_of_binary[b] = wid
        wide_children.append([])

        # gather up to WIDTH subtree roots under b
        roots = [left[b], right[b]]
        while len(roots) < WIDTH:
            # expand the internal root with the largest subtree (by picking
            # any internal; use the one with widest bounds heuristically ->
            # just first internal found)
            pick = -1
            for i, r in enumerate(roots):
                if left[r] != -1:
                    pick = i
                    break
            if pick < 0:
                break
            r = roots.pop(pick)
            roots.extend([left[r], right[r]])
        wide_children[wid] = roots
        for r in roots:
            if left[r] != -1:
                queue.append(r)

    # second pass: encode child codes + bounds
    nn8 = len(wide_children)
    nodes = np.zeros((max(nn8, 1), NODE_ROW), np.float32)
    codes_arr = np.full((max(nn8, 1), WIDTH), EMPTY, np.int32)
    B = NODE_BASE
    for wid, roots in enumerate(wide_children):
        for k, r in enumerate(roots):
            if left[r] == -1:
                code = make_leaf(r)
            else:
                code = wide_of_binary[r]
            codes_arr[wid, k] = code
            nodes[wid, B + 6 * k : B + 6 * k + 3] = lo[r]
            nodes[wid, B + 6 * k + 3 : B + 6 * k + 6] = hi[r]
        for k in range(len(roots), WIDTH):
            # empty slot: inverted bounds (slab test always misses)
            nodes[wid, B + 6 * k : B + 6 * k + 3] = 3e38
            nodes[wid, B + 6 * k + 3 : B + 6 * k + 6] = -3e38
    nodes[:, 0:WIDTH] = codes_arr.view(np.float32)

    # leaf table (single fused row: verts + bitcast face ids)
    L = max(len(leaf_rows), 1)
    leaf_tris = np.zeros((L, LEAF_ROW), np.float32)
    leaf_face = np.full((L, LEAF_CAP), -1, np.int32)
    for li, (f0, c) in enumerate(leaf_rows):
        if c > LEAF_CAP:  # builders guarantee <= cap via median fallback
            raise ValueError(f"leaf overflow: {c} > {LEAF_CAP}")
        leaf_tris[li, : 9 * c] = tri_verts_flat[f0 : f0 + c].reshape(-1)
        leaf_face[li, :c] = faces_global[f0 : f0 + c]
    leaf_tris[:, FACE_OFF:LEAF_ROW] = leaf_face.view(np.float32)

    # degenerate whole-scene-is-one-leaf case: synthesize a root node
    if nn8 == 0:
        code = make_leaf(0) if not leaf_rows else -2
        codes_arr = np.full((1, WIDTH), EMPTY, np.int32)
        codes_arr[0, 0] = -2
        nodes = np.zeros((1, NODE_ROW), np.float32)
        nodes[0, 0:WIDTH] = codes_arr.view(np.float32)
        B = NODE_BASE
        nodes[0, B : B + 3] = lo[0]
        nodes[0, B + 3 : B + 6] = hi[0]
        for k in range(1, WIDTH):
            nodes[0, B + 6 * k : B + 6 * k + 3] = 3e38
            nodes[0, B + 6 * k + 3 : B + 6 * k + 6] = -3e38
        L = max(len(leaf_rows), 1)
        leaf_tris = np.zeros((L, LEAF_ROW), np.float32)
        leaf_face = np.full((L, LEAF_CAP), -1, np.int32)
        for li, (f0, c) in enumerate(leaf_rows):
            c = min(c, LEAF_CAP)
            leaf_tris[li, : 9 * c] = tri_verts_flat[f0 : f0 + c].reshape(-1)
            leaf_face[li, :c] = faces_global[f0 : f0 + c]
        leaf_tris[:, FACE_OFF:LEAF_ROW] = leaf_face.view(np.float32)

    # build-time stack guarantee: depth * (WIDTH-1) pushes must fit
    if nn8 > 0:
        depth = np.ones(nn8, np.int32)
        maxd = 1
        work = [0]
        while work:
            wid = work.pop()
            for code in codes_arr[wid]:
                if code >= 0:
                    depth[code] = depth[wid] + 1
                    maxd = max(maxd, int(depth[code]))
                    work.append(int(code))
        if maxd * (WIDTH - 1) > STACK_DEPTH:
            raise ValueError(
                f"wide-BVH depth {maxd} needs {maxd * (WIDTH - 1)} stack "
                f"slots > STACK_DEPTH={STACK_DEPTH}; deepen LEAF_CAP or "
                "raise STACK_DEPTH"
            )

    return nodes, leaf_tris, leaf_face
