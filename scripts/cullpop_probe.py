"""Host probe: iterations saved by the windowed culled-pop skip.

Emulates the persistent stepper's traversal order exactly (near-first
descend, push far-sorted, t_best culling at test time) and counts gather
iterations per ray segment in two schemes:

  old:  every pop costs an iteration, even when the entry's push-time
        t_near already exceeds t_best (the subtree cannot improve the hit);
  new:  a pop first drops up to DROP_SCAN leading culled entries for free
        (windowed t-stack; entries revealed from below the
        DROP_SCAN+WIDTH window read "unknown" = not culled).

Run for camera rays and for diffuse bounce rays (secondary segments are
the majority of a depth-8 path's work).

Usage: python scripts/cullpop_probe.py [n_rays] [drop_scan]
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
DROP = int(sys.argv[2]) if len(sys.argv) > 2 else 4
WINDOW = DROP + WIDTH

scene, _ = load_flagship(res=(1280, 720), spp=4, tri_budget=2_000_000)
nodes = np.asarray(scene.bvh.nodes)
codes_all = nodes[:, 0:WIDTH].view(np.int32)
bounds_all = nodes[:, NODE_BASE : NODE_BASE + 6 * WIDTH].reshape(
    -1, WIDTH, 6
)
leafs = np.asarray(scene.bvh.leaf_tris)
ltris = leafs[:, : 9 * LEAF_CAP].reshape(-1, LEAF_CAP, 3, 3)
lface = leafs[:, FACE_OFF:LEAF_ROW].view(np.int32)


def trace(o, d, with_drop: bool):
    """Return (iterations, hit point, hit normal-ish dir) for one segment.

    Stack entries are (code, t_near_at_push, depth_below_window_marker):
    the window is emulated by tracking each entry's distance from the top;
    entries deeper than WINDOW when a drop is attempted read 'unknown'."""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    t_best = np.inf
    hit_p = None
    stack = []  # list of (code, tn); top = end
    cur = 0
    iters = 0
    while True:
        iters += 1
        if cur >= 0:  # internal
            codes, bb = codes_all[cur], bounds_all[cur]
            t0 = (bb[:, 0:3] - o) * inv
            t1 = (bb[:, 3:6] - o) * inv
            tn = np.minimum(t0, t1).max(-1)
            tf = np.maximum(t0, t1).min(-1)
            hit = (
                (tn <= tf * 1.00000024) & (tf > 0) & (tn < t_best)
                & (codes != -1)
            )
            if hit.any():
                hi = np.nonzero(hit)[0]
                order = hi[np.argsort(-tn[hi])]  # far first
                # descend nearest; push the rest far-first
                cur = int(codes[order[-1]])
                for k in order[:-1]:
                    stack.append((int(codes[k]), float(tn[k])))
                continue
        else:  # leaf
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
                hit_p = o + t_best * d
        # pop (with optional windowed drop)
        if with_drop:
            drops = 0
            while (
                stack and drops < DROP
                and drops < len(stack)  # can't look past the stack
                and (len(stack) - 1 - drops) >= 0
                and stack[-1 - 0][1] is not None
                and stack[-1][1] >= t_best
            ):
                stack.pop()
                drops += 1
        if not stack:
            return iters, hit_p
        cur = stack.pop()[0]


rng = np.random.default_rng(3)
pix = rng.integers(0, 1280 * 720, size=n_rays)
pos = np.stack([pix % 1280, pix // 1280], -1).astype(np.float32) + 0.5
ray = sensorlib.sample_ray(scene.camera, pos)
O = np.asarray(ray.o)
D = np.asarray(ray.d)

for label in ("camera", "bounce"):
    it_old, it_new = [], []
    for i in range(n_rays):
        o, d = O[i], D[i]
        if label == "bounce":
            # start from the camera hit, bounce in a random hemisphere dir
            _, p = trace(o, d, False)
            if p is None:
                continue
            nrm = rng.standard_normal(3)
            nrm /= np.linalg.norm(nrm)
            o = p + 1e-3 * nrm
            d = nrm
        a, _ = trace(o, d, False)
        b, _ = trace(o, d, True)
        it_old.append(a)
        it_new.append(b)
    io, inw = np.array(it_old), np.array(it_new)
    print(
        f"{label}: old {io.mean():.1f} iters/segment, "
        f"new {inw.mean():.1f}  (saved {100*(1-inw.mean()/io.mean()):.1f}%),"
        f" p95 {np.percentile(io,95):.0f} -> {np.percentile(inw,95):.0f}",
        flush=True,
    )
