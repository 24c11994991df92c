"""A/B: LEAF_CAP (triangles per packed leaf row, scene/bvh8.py) on the
flagship forward render.

Gathers are latency-bound and width-independent on this TPU (BENCH.md), so
a bigger LEAF_CAP trades wider rows (~free) + more unrolled VPU triangle
tests for FEWER traversal iterations (fewer leaf rows, shallower tree).
Run once per setting:

    python scripts/leafcap_ab.py [n_lanes] [steps]          # LEAF_CAP=8
    M3T_LEAF_CAP=16 python scripts/leafcap_ab.py 65536 24   # LEAF_CAP=16

Prints rays/s plus the image mean (the estimator must agree across
settings — same RNG, same sampling, different tree only changes hit-order
ties).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from mitsuba3_experiments_tpu.integrators.persistent import render_persistent
from mitsuba3_experiments_tpu.scene.bvh8 import LEAF_CAP, LEAF_ROW, WIDTH
from mitsuba3_experiments_tpu.scene.flagship import load_flagship

n_lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 24

print(f"device: {jax.devices()[0]}  WIDTH={WIDTH} LEAF_CAP={LEAF_CAP} "
      f"(row {LEAF_ROW})", flush=True)
scene, _ = load_flagship(res=(1280, 720), spp=4, tri_budget=2_000_000)
print(f"bvh: {scene.bvh.nodes.shape[0]} nodes, "
      f"{scene.bvh.leaf_tris.shape[0]} leaf rows, "
      f"unified {scene.bvh.unified.shape}", flush=True)
n_rays = 1280 * 720 * 4

t0 = time.perf_counter()
img = np.asarray(render_persistent(
    scene, spp=4, max_depth=8, rr_depth=2, n_lanes=n_lanes, steps=steps,
    rounds_per_launch=8,
))
print(f"first (compile+run): {time.perf_counter() - t0:.1f} s", flush=True)

best = np.inf
for _ in range(3):
    t0 = time.perf_counter()
    img = np.asarray(render_persistent(
        scene, spp=4, max_depth=8, rr_depth=2, n_lanes=n_lanes,
        steps=steps, rounds_per_launch=8,
    ))
    best = min(best, time.perf_counter() - t0)
print(f"WIDTH={WIDTH} LEAF_CAP={LEAF_CAP} lanes={n_lanes} steps={steps}: "
      f"{best:.2f} s -> {n_rays / best:,.0f} rays/s  "
      f"img mean {img.mean():.6f}", flush=True)
