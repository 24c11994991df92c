"""TPU bench: staged wavefront renderer vs the round-1 chunked lockstep path.

Usage: python scripts/wavefront_bench.py '[{"n_lanes":32768}]'
Each config dict: n_lanes, chunk, sort_every, spp, depth, res, tris.
"""
import json
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
from mitsuba3_experiments_tpu.integrators.wavefront import render_wavefront
from mitsuba3_experiments_tpu.scene.flagship import load_flagship

cfgs = json.loads(sys.argv[1]) if len(sys.argv) > 1 else [
    {"n_lanes": 32768, "chunk": None, "sort_every": 0},
]

print("device:", jax.devices()[0], flush=True)
_scene_cache = {}
for cfg in cfgs:
    res = tuple(cfg.get("res", (1280, 720)))
    spp = cfg.get("spp", 4)
    depth = cfg.get("depth", 8)
    tris = cfg.get("tris", 2_000_000)
    key = (res, spp, tris)
    if key not in _scene_cache:
        _scene_cache[key] = load_flagship(res=res, spp=spp, tri_budget=tris)[0]
    scene = _scene_cache[key]
    if cfg.get("mode") == "persistent":
        kw = dict(
            spp=spp, max_depth=depth, rfilter="tent",
            n_lanes=cfg.get("n_lanes", 32768),
            steps=cfg.get("steps", 16),
            rounds_per_launch=cfg.get("rpl", 8),
        )
        renderer = render_persistent
    else:
        kw = dict(
            spp=spp, max_depth=depth, rfilter="tent",
            n_lanes=cfg.get("n_lanes", 32768), chunk=cfg.get("chunk"),
            sort_every=cfg.get("sort_every", 0),
            poll_every=cfg.get("poll_every", 24),
            rounds_per_launch=cfg.get("rpl", 1),
        )
        renderer = render_wavefront
    n_total = res[0] * res[1] * spp
    t0 = time.perf_counter()
    img = np.asarray(renderer(scene, seed=1, **kw))
    warm = time.perf_counter() - t0
    print(f"# warm(compile) {warm:.1f}s mean={img.mean():.4f}", flush=True)
    t0 = time.perf_counter()
    img = np.asarray(renderer(scene, seed=2, **kw))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "cfg": cfg, "time_s": round(dt, 2),
        "rays_per_s": round(n_total / dt, 1),
        "img_mean": float(img.mean()),
    }), flush=True)
