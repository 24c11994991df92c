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
# Collapse expansion strategy: which binary child to flatten next while
# widening a node to WIDTH subtrees.  "area" expands the child with the
# LARGEST surface area (SA-greedy, Ylitie et al. 2017 style) and measures
# -8% rows/ray on the flagship (scripts/collapse_ab.py: 18.39 -> 16.92) —
# but the SA-greedy tree is DEEPER (worst-case stack need 91 vs 64), and
# the chip A/B shows the extra 16 shift-register stack columns cost more
# than the row savings: first@80 300,999 rays/s, area@96 290,561,
# first@96 282,462 (the stack alone is -6.2%).  "first" stays the default;
# "area" is kept for shallow scenes / future cheaper-stack designs.
COLLAPSE = os.environ.get("M3T_COLLAPSE", "first")
# Spatial-split (SBVH) binary build before the collapse — see
# native/sbvh_builder.cpp and scene/native.py::try_build_sbvh_native.
# Chip A/B (flagship fwd, 65536/24): sbvh+first 312,313 rays/s vs plain
# first 300,999 (+3.8%) with identical images; host probe: 18.39 -> 16.9
# rows/ray (-8.1%) at +3.5% duplicated references.  Default ON.
SBVH = os.environ.get("M3T_SBVH", "1") == "1"
SBVH_ALPHA = float(os.environ.get("M3T_SBVH_ALPHA", "1e-4"))
# Traversal stack capacity (intersect/bvh_jax.py uses the same constant).
# collapse_to_wide raises at build time if the EXACT worst-case stack need
# — max over root-to-leaf paths of sum(children-1) — exceeds this (ADVICE
# round 1: silent overflow would drop subtrees -> missed hits).  The 2M-tri
# flagship needs 64 slots under "first" and 91 under "area" (the SA-greedy
# tree is deeper but visits fewer rows); the shift-register stack's cost is
# elementwise VPU traffic that measures as hidden under the row-gather
# latency (BENCH.md round 3: stepper marginal == pure gather probe cost).
STACK_DEPTH = int(os.environ.get(
    "M3T_STACK_DEPTH",
    ("96" if COLLAPSE == "area" else "80") if WIDTH == 8
    else str(8 * (WIDTH - 1)),
))


def collapse_to_wide(lo, hi, left, right, first, count, prim_order,
                     tri_verts_flat, faces_global):
    """Binary SAH arrays -> packed wide tables (host, numpy + python loop).

    tri_verts_flat: (F, 9) f32 triangle vertices in prim_order slot order.
    faces_global:   (F,) i32 global face id per slot.
    """
    n_bin = left.shape[0]
    if COLLAPSE == "area":
        dx = np.maximum(hi[:, 0] - lo[:, 0], 0.0)
        dy = np.maximum(hi[:, 1] - lo[:, 1], 0.0)
        dz = np.maximum(hi[:, 2] - lo[:, 2], 0.0)
        area = 2.0 * (dx * dy + dy * dz + dz * dx)
    else:
        area = None

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
            pick = -1
            if area is not None:
                # SA-greedy: expand the internal root with the largest
                # surface area (see COLLAPSE above)
                best_a = -1.0
                for i, r in enumerate(roots):
                    if left[r] != -1 and area[r] > best_a:
                        best_a = area[r]
                        pick = i
            else:
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

    # build-time stack guarantee: EXACT worst-case need — visiting a node
    # with c hit children pushes c-1 entries before descending, so the need
    # is max over root-to-leaf paths of sum(children-1).  Children wids are
    # allocated strictly after their parent's, so a reverse-wid sweep is
    # bottom-up.
    if nn8 > 0:
        need = np.zeros(nn8, np.int64)
        for wid in range(nn8 - 1, -1, -1):
            cs = codes_arr[wid]
            n_ch = int(np.sum(cs != EMPTY))
            child_need = 0
            for code in cs:
                if code >= 0:
                    child_need = max(child_need, int(need[code]))
            need[wid] = (n_ch - 1) + child_need
        if int(need[0]) > STACK_DEPTH:
            raise ValueError(
                f"wide-BVH worst-case stack need {int(need[0])} > "
                f"STACK_DEPTH={STACK_DEPTH}; deepen LEAF_CAP or raise "
                "M3T_STACK_DEPTH"
            )

    return nodes, leaf_tris, leaf_face
