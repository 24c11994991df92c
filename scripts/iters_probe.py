"""Host probe: mean BVH rows visited per camera ray on the flagship scene.

The persistent stepper's cost is (rows visited per ray) x (per-iteration
gather latency), so this predicts the LEAF_CAP win without chip time.
Mirrors intersect/bvh_jax.py traversal order (near-first descend, t_best
culling, real triangle tests) in numpy, one ray at a time.

Usage: [M3T_LEAF_CAP=16] python scripts/iters_probe.py [n_rays]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from mitsuba3_experiments_tpu.render import sensor as sensorlib
from mitsuba3_experiments_tpu.scene.bvh8 import (
    FACE_OFF,
    LEAF_CAP,
    LEAF_ROW,
    NODE_BASE,
    WIDTH,
)
from mitsuba3_experiments_tpu.scene.flagship import load_flagship

n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 512

scene, _ = load_flagship(res=(1280, 720), spp=4, tri_budget=2_000_000)
nodes = np.asarray(scene.bvh.nodes)
codes_all = nodes[:, 0:WIDTH].view(np.int32)
bounds_all = nodes[:, NODE_BASE : NODE_BASE + 6 * WIDTH].reshape(
    -1, WIDTH, 6
)
leafs = np.asarray(scene.bvh.leaf_tris)
ltris = leafs[:, : 9 * LEAF_CAP].reshape(-1, LEAF_CAP, 3, 3)
lface = leafs[:, FACE_OFF:LEAF_ROW].view(np.int32)

rng = np.random.default_rng(3)
pix = rng.integers(0, 1280 * 720, size=n_rays)
pos = np.stack([pix % 1280, pix // 1280], -1).astype(np.float32) + 0.5
ray = sensorlib.sample_ray(scene.camera, pos)
O = np.asarray(ray.o)
D = np.asarray(ray.d)

int_v, leaf_v = [], []
for i in range(n_rays):
    o, d = O[i], D[i]
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    t_best = np.inf
    stack = [0]
    ni = nl = 0
    while stack:
        cur = stack.pop()
        if cur >= 0:  # internal
            ni += 1
            codes, bb = codes_all[cur], bounds_all[cur]
            t0 = (bb[:, 0:3] - o) * inv
            t1 = (bb[:, 3:6] - o) * inv
            tn = np.minimum(t0, t1).max(-1)
            tf = np.maximum(t0, t1).min(-1)
            hit = (tn <= tf * 1.00000024) & (tf > 0) & (tn < t_best) & (codes != -1)
            order = np.argsort(-tn[hit])  # far first -> near popped first
            stack.extend(codes[hit][order].tolist())
        else:  # leaf
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
                (np.abs(det) > 1e-10) & (u >= 0) & (v >= 0) & (u + v <= 1)
                & (t > 0) & (t < t_best) & (lface[li] >= 0)
            )
            if ok.any():
                t_best = t[ok].min()
    int_v.append(ni)
    leaf_v.append(nl)

int_v, leaf_v = np.array(int_v), np.array(leaf_v)
tot = int_v + leaf_v
print(
    f"WIDTH={WIDTH} LEAF_CAP={LEAF_CAP}: rows/ray mean {tot.mean():.1f} "
    f"(internal {int_v.mean():.1f} + leaf {leaf_v.mean():.1f}), "
    f"p50 {np.percentile(tot, 50):.0f}, p95 {np.percentile(tot, 95):.0f}, "
    f"max {tot.max()}"
)
