"""Host A/B: wide-BVH collapse strategy vs rows visited per camera ray.

The persistent stepper pays ~12.3 ns per gathered row (BENCH.md round-3
gather probe), linear in rows — so (rows/ray) is the direct objective.
This probes collapse strategies for the binary->8-wide conversion
(scene/bvh8.py) without chip time:

  first  — current: expand the first internal root found (order-arbitrary)
  area   — SA-greedy: expand the internal root with the LARGEST surface
           area (Ylitie et al. 2017 style greedy; big boxes are hit by
           more rays, so flattening them first minimizes expected depth)

Usage: python scripts/collapse_ab.py [n_rays]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from mitsuba3_experiments_tpu.render import sensor as sensorlib
from mitsuba3_experiments_tpu.scene import bvh8
from mitsuba3_experiments_tpu.scene.native import (
    try_build_bvh_native,
    try_build_sbvh_native,
)
from mitsuba3_experiments_tpu.scene.flagship import load_flagship

WIDTH, LEAF_CAP = bvh8.WIDTH, bvh8.LEAF_CAP
NODE_BASE, FACE_OFF, LEAF_ROW = bvh8.NODE_BASE, bvh8.FACE_OFF, bvh8.LEAF_ROW

n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 512

scene, _ = load_flagship(res=(1280, 720), spp=4, tri_budget=2_000_000)
V = np.asarray(scene.geometry.vertices)
F = np.asarray(scene.geometry.faces)
print(f"mesh: {len(V)} verts, {len(F)} tris", flush=True)

t0 = time.time()
lo, hi, left, right, first, count, order, max_leaf = try_build_bvh_native(
    V, F, LEAF_CAP
)
print(f"binary SAH build: {time.time()-t0:.1f}s, {len(left)} nodes",
      flush=True)


def derived(order):
    tv = V[F.astype(np.int64)[order]].reshape(len(order), 9).astype(
        np.float32
    )
    return tv, order.astype(np.int32)


tv_flat, fg = derived(order)


def collapse(strategy: str, lo=None, hi=None, left=None, right=None,
             first=None, count=None, tv_flat=None, fg=None):
    """collapse_to_wide with a pluggable expansion pick.

    Strategies: "first", "area", and "+lm" suffix = leaf-merge: when the
    child set is full but two leaf roots fit in one leaf row (combined
    count <= LEAF_CAP), merge the min-union-area pair to free a slot for
    further expansion (denser wide nodes, fewer leaf rows)."""
    g = globals()
    lo = g["lo"] if lo is None else lo
    hi = g["hi"] if hi is None else hi
    left = g["left"] if left is None else left
    right = g["right"] if right is None else right
    first = g["first"] if first is None else first
    count = g["count"] if count is None else count
    tv_flat = g["tv_flat"] if tv_flat is None else tv_flat
    fg = g["fg"] if fg is None else fg
    leaf_merge = strategy.endswith("+lm")
    strategy = strategy.removesuffix("+lm")
    area = None
    if strategy == "area":
        dx = np.maximum(hi[:, 0] - lo[:, 0], 0)
        dy = np.maximum(hi[:, 1] - lo[:, 1], 0)
        dz = np.maximum(hi[:, 2] - lo[:, 2], 0)
        area = 2 * (dx * dy + dy * dz + dz * dx)

    if area is None:
        dx = np.maximum(hi[:, 0] - lo[:, 0], 0)
        dy = np.maximum(hi[:, 1] - lo[:, 1], 0)
        dz = np.maximum(hi[:, 2] - lo[:, 2], 0)
        area = 2 * (dx * dy + dy * dz + dz * dx)

    def union_area(blo, bhi):
        d = np.maximum(bhi - blo, 0)
        return 2 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    # entry: ("node", b) | ("leaf", [b...], lo3, hi3, count)
    wide_children = []
    leaf_rows = []   # list[list[(first, count)]]

    def leaf_entry(b):
        return ("leaf", [b], lo[b].copy(), hi[b].copy(), int(count[b]))

    def make_leaf(bs):
        leaf_rows.append([(int(first[b]), int(count[b])) for b in bs])
        return -(len(leaf_rows) - 1) - 2

    wide_of_binary = {}
    queue = [0]
    while queue:
        b = queue.pop()
        if b in wide_of_binary or left[b] == -1:
            continue
        wid = len(wide_children)
        wide_of_binary[b] = wid
        wide_children.append([])

        def as_entry(r):
            return ("node", r) if left[r] != -1 else leaf_entry(r)

        roots = [as_entry(left[b]), as_entry(right[b])]
        while True:
            if len(roots) >= WIDTH and leaf_merge:
                # merge the min-union-area pair of leaf entries that fits
                # one row, freeing a slot for more expansion
                best = None
                for i in range(len(roots)):
                    if roots[i][0] != "leaf":
                        continue
                    for j in range(i + 1, len(roots)):
                        if roots[j][0] != "leaf":
                            continue
                        if roots[i][4] + roots[j][4] > LEAF_CAP:
                            continue
                        ulo = np.minimum(roots[i][2], roots[j][2])
                        uhi = np.maximum(roots[i][3], roots[j][3])
                        a = union_area(ulo, uhi)
                        if best is None or a < best[0]:
                            best = (a, i, j, ulo, uhi)
                # only merge if a further expansion is actually possible
                if best is not None and any(
                    e[0] == "node" for e in roots
                ):
                    _, i, j, ulo, uhi = best
                    merged = ("leaf", roots[i][1] + roots[j][1], ulo, uhi,
                              roots[i][4] + roots[j][4])
                    roots = [e for k, e in enumerate(roots)
                             if k not in (i, j)] + [merged]
            if len(roots) >= WIDTH:
                break
            pick = -1
            if strategy == "first":
                for i, e in enumerate(roots):
                    if e[0] == "node":
                        pick = i
                        break
            else:  # area
                best_a = -1.0
                for i, e in enumerate(roots):
                    if e[0] == "node" and area[e[1]] > best_a:
                        best_a = area[e[1]]
                        pick = i
            if pick < 0:
                break
            r = roots.pop(pick)[1]
            roots.extend([as_entry(left[r]), as_entry(right[r])])
        wide_children[wid] = roots
        for e in roots:
            if e[0] == "node":
                queue.append(e[1])

    nn8 = len(wide_children)
    nodes = np.zeros((nn8, bvh8.NODE_ROW), np.float32)
    codes_arr = np.full((nn8, WIDTH), -1, np.int32)
    B = NODE_BASE
    for wid, roots in enumerate(wide_children):
        for k, e in enumerate(roots):
            if e[0] == "node":
                codes_arr[wid, k] = wide_of_binary[e[1]]
                elo, ehi = lo[e[1]], hi[e[1]]
            else:
                codes_arr[wid, k] = make_leaf(e[1])
                elo, ehi = e[2], e[3]
            nodes[wid, B + 6 * k : B + 6 * k + 3] = elo
            nodes[wid, B + 6 * k + 3 : B + 6 * k + 6] = ehi
        for k in range(len(roots), WIDTH):
            nodes[wid, B + 6 * k : B + 6 * k + 3] = 3e38
            nodes[wid, B + 6 * k + 3 : B + 6 * k + 6] = -3e38
    nodes[:, 0:WIDTH] = codes_arr.view(np.float32)

    L = max(len(leaf_rows), 1)
    leaf_tris = np.zeros((L, LEAF_ROW), np.float32)
    leaf_face = np.full((L, LEAF_CAP), -1, np.int32)
    for li, ranges in enumerate(leaf_rows):
        o = 0
        for f0, c in ranges:
            leaf_tris[li, 9 * o : 9 * (o + c)] = tv_flat[
                f0 : f0 + c
            ].reshape(-1)
            leaf_face[li, o : o + c] = fg[f0 : f0 + c]
            o += c
    leaf_tris[:, FACE_OFF:LEAF_ROW] = leaf_face.view(np.float32)
    return nodes, leaf_tris


rng = np.random.default_rng(3)
pix = rng.integers(0, 1280 * 720, size=n_rays)
pos = np.stack([pix % 1280, pix // 1280], -1).astype(np.float32) + 0.5
ray = sensorlib.sample_ray(scene.camera, pos)
O = np.asarray(ray.o)
D = np.asarray(ray.d)


def probe(nodes, leaf_tris):
    codes_all = nodes[:, 0:WIDTH].view(np.int32)
    bounds_all = nodes[:, NODE_BASE : NODE_BASE + 6 * WIDTH].reshape(
        -1, WIDTH, 6
    )
    ltris = leaf_tris[:, : 9 * LEAF_CAP].reshape(-1, LEAF_CAP, 3, 3)
    lface = leaf_tris[:, FACE_OFF:LEAF_ROW].view(np.int32)
    int_v, leaf_v = [], []
    hits = []
    for i in range(n_rays):
        o, d = O[i], D[i]
        with np.errstate(over="ignore", invalid="ignore"):
            inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
            t_best = np.inf
            stack = [0]
            ni = nl = 0
            while stack:
                cur = stack.pop()
                if cur >= 0:
                    ni += 1
                    codes, bb = codes_all[cur], bounds_all[cur]
                    t0_ = (bb[:, 0:3] - o) * inv
                    t1_ = (bb[:, 3:6] - o) * inv
                    tn = np.minimum(t0_, t1_).max(-1)
                    tf = np.maximum(t0_, t1_).min(-1)
                    h = (
                        (tn <= tf * 1.00000024) & (tf > 0)
                        & (tn < t_best) & (codes != -1)
                    )
                    o_ = np.argsort(-tn[h])
                    stack.extend(codes[h][o_].tolist())
                else:
                    nl += 1
                    li = -cur - 2
                    tri = ltris[li]
                    v0 = tri[:, 0]
                    e1 = tri[:, 1] - v0
                    e2 = tri[:, 2] - v0
                    pv = np.cross(d, e2)
                    det = (e1 * pv).sum(-1)
                    invd = 1.0 / np.where(np.abs(det) < 1e-12, 1e-12, det)
                    tv = o - v0
                    u = (tv * pv).sum(-1) * invd
                    qv = np.cross(tv, e1)
                    v = (d * qv).sum(-1) * invd
                    t = (e2 * qv).sum(-1) * invd
                    ok = (
                        (np.abs(det) > 1e-10) & (u >= 0) & (v >= 0)
                        & (u + v <= 1) & (t > 0) & (t < t_best)
                        & (lface[li] >= 0)
                    )
                    if ok.any():
                        t_best = t[ok].min()
        int_v.append(ni)
        leaf_v.append(nl)
        hits.append(t_best)
    int_v, leaf_v = np.array(int_v), np.array(leaf_v)
    tot = int_v + leaf_v
    return tot, int_v, leaf_v, np.array(hits)


base_hits = None


def report(tag, nodes, leaf_tris, tc):
    global base_hits
    tot, iv, lv, hits = probe(nodes, leaf_tris)
    if base_hits is None:
        base_hits = hits
    else:
        same = np.isclose(hits, base_hits, rtol=1e-5, equal_nan=True).mean()
        assert same > 0.999, f"hit t mismatch: {same}"
    print(
        f"{tag:24s}: rows/ray {tot.mean():.2f} (int {iv.mean():.2f} + "
        f"leaf {lv.mean():.2f}), p95 {np.percentile(tot,95):.0f}, "
        f"max {tot.max()}, wide nodes {len(nodes)}, "
        f"leaf rows {len(leaf_tris)}, prep {tc:.1f}s",
        flush=True,
    )


for strat in ("first", "area", "first+lm"):
    t0 = time.time()
    nodes, leaf_tris = collapse(strat)
    report(strat, nodes, leaf_tris, time.time() - t0)

for alpha in (1e-4,):
    t0 = time.time()
    sb = try_build_sbvh_native(V, F, LEAF_CAP, alpha=alpha,
                               budget_factor=2.0)
    if sb is None:
        print("sbvh: native lib unavailable", flush=True)
        break
    slo, shi, sl, sr, sf, sc, sorder, _ = sb
    stv, sfg = derived(sorder)
    print(f"  sbvh build a={alpha:g}: refs {len(sorder)} "
          f"(+{100.0*(len(sorder)-len(F))/len(F):.1f}%)", flush=True)
    for strat in ("first", "first+lm", "area"):
        t0 = time.time()
        nodes, leaf_tris = collapse(
            strat, lo=slo, hi=shi, left=sl, right=sr, first=sf, count=sc,
            tv_flat=stv, fg=sfg,
        )
        report(f"sbvh a={alpha:g} + {strat}", nodes, leaf_tris,
               time.time() - t0)
