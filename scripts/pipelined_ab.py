"""Chip A/B: two-path pipelined scheduler vs single-path persistent.

Flagship forward workload (the round-3 headline rung: 1280x720 spp4 d8,
tent).  Sweeps lane count and steps for the pipelined machine; asserts
image equality (same estimates, different scheduling).

Usage: python scripts/pipelined_ab.py [configs...]
  configs: "persistent:65536:20" | "pipelined:65536:20" etc.
  default: persistent:65536:20 pipelined:65536:20 pipelined:32768:20
           pipelined:65536:28
"""
import json
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

from mitsuba3_experiments_tpu.integrators.persistent import render_persistent
from mitsuba3_experiments_tpu.integrators.pipelined import render_pipelined
from mitsuba3_experiments_tpu.scene.flagship import load_flagship


def main():
    cfgs = sys.argv[1:] or [
        "persistent:65536:20", "pipelined:65536:20",
        "pipelined:32768:20", "pipelined:65536:28",
    ]
    w, h, spp, depth = 1280, 720, 4, 8
    scene, _ = load_flagship(res=(w, h), spp=spp, tri_budget=2_000_000)
    n_rays = w * h * spp

    results = {}
    ref_mean, ref_depth = None, None
    for c in cfgs:
        parts = c.split(":")  # kind:lanes:steps[:depth[:slots[:arm[:ret]]]]
        kind, lanes, steps = parts[0], int(parts[1]), int(parts[2])
        dep = int(parts[3]) if len(parts) > 3 else depth
        fn = render_persistent if kind == "persistent" else render_pipelined
        kw = dict(spp=spp, max_depth=dep, rr_depth=4, rfilter="tent",
                  n_lanes=lanes, steps=steps, rounds_per_launch=32)
        if len(parts) > 4:
            if kind != "pipelined":
                raise SystemExit(
                    f"{c}: slots/arm fields are pipelined-only "
                    "(persistent configs take kind:lanes:steps[:depth])"
                )
            kw["n_slots"] = int(parts[4])
        if len(parts) > 5:
            kw["arm_every"] = int(parts[5])
        if len(parts) > 6:
            kw["retire"] = parts[6]
        t0 = time.perf_counter()
        img = fn(scene, seed=1, **kw)
        jax.block_until_ready(img)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        img = fn(scene, seed=1, **kw)
        jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        mean = float(np.asarray(img).mean())
        if ref_mean is None or dep != ref_depth:
            ref_mean, ref_depth = mean, dep
        rate = n_rays / dt
        print(f"{c}: {dt:.2f}s = {rate:.0f} rays/s  mean={mean:.6f} "
              f"(compile+1st {t_compile:.0f}s)", flush=True)
        results[c] = {"rays_s": rate, "s": dt, "mean": mean}
        assert abs(mean - ref_mean) < 1e-4, (mean, ref_mean)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
