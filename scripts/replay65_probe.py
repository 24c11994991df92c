"""Depth-65 fwd+bwd probe: the REAL bedroom workload (scene.xml:6 sets
max_depth=65) through record + replay, comparing uniform-chunk replay
(replay_grads_full: every chunk scans all 65 depths) against the
path-length-sorted bucketed replay (replay_grads_sorted: each chunk scans
only as deep as its longest recorded path — RR kills most paths at ~5-8
bounces, so most chunks replay at a tiny fraction of the 65-step scan).

Usage: python scripts/replay65_probe.py [spp] [depth]
"""
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from mitsuba3_experiments_tpu.integrators.replay import (
    path_lengths,
    record_full,
    replay_grads_full,
    replay_grads_sorted,
)
from mitsuba3_experiments_tpu.scene.flagship import load_flagship
from mitsuba3_experiments_tpu.scene.params import update


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 65
    w, h = 1280, 720
    scene, _ = load_flagship(res=(w, h), spp=spp, tri_budget=2_000_000)
    n_rays = w * h * spp
    chunk = 131072
    pad = ((n_rays + chunk - 1) // chunk) * chunk
    rkw = dict(spp=spp, max_depth=depth, rr_depth=4, steps=24,
               rounds_per_launch=32)

    diff_params = {
        "materials.base_color": scene.materials.base_color,
        "emitters.radiance": scene.emitters.radiance,
    }
    target = jnp.zeros((h, w, 3), jnp.float32)

    rec = record_full(scene, 1, n_rays, n_lanes=65536, pad_to=pad, **rkw)
    jax.block_until_ready(rec.prim)
    t0 = time.perf_counter()
    rec = record_full(scene, 1, n_rays, n_lanes=65536, pad_to=pad, **rkw)
    jax.block_until_ready(rec.prim)
    t_rec = time.perf_counter() - t0
    lens = np.asarray(path_lengths(rec))[:n_rays]
    print(f"record_full d={depth}: {t_rec:.2f}s = {n_rays/t_rec:.0f} "
          f"rays/s; path-length p50 {np.percentile(lens,50):.0f} "
          f"p95 {np.percentile(lens,95):.0f} max {lens.max()} "
          f"mean {lens.mean():.2f}", flush=True)

    results = {"depth": depth, "record_s": t_rec,
               "len_mean": float(lens.mean()), "len_max": int(lens.max())}
    for name, fn in (("sorted", replay_grads_sorted),
                     ("full", replay_grads_full)):
        kw = dict(chunk=chunk, spp=spp, max_depth=depth, rr_depth=4,
                  rfilter="box")
        g = fn(scene, diff_params, update, target, 1, rec, n_rays, **kw)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        g = fn(scene, diff_params, update, target, 1, rec, n_rays, **kw)
        jax.block_until_ready(g)
        t_rep = time.perf_counter() - t0
        tot = t_rec + t_rep
        print(f"replay_{name}: {t_rep:.2f}s -> fwd+bwd "
              f"{n_rays/tot:.0f} rays/s", flush=True)
        results[name] = {"replay_s": t_rep, "fwdbwd_rays_s": n_rays / tot}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
