"""Probe the fwd+bwd split: record_full time vs replay_grads_full time,
and replay chunk-size scaling, on the flagship bench config.

Usage: python scripts/replay_probe.py [tri_budget] [res]
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

import jax.numpy as jnp

from mitsuba3_experiments_tpu.integrators.replay import (
    record_full,
    replay_grads_full,
)
from mitsuba3_experiments_tpu.scene.flagship import load_flagship
from mitsuba3_experiments_tpu.scene.params import update


def main():
    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    res = sys.argv[2] if len(sys.argv) > 2 else "1280x720"
    w, h = (int(x) for x in res.split("x"))
    spp, depth = 4, 8
    scene, meta = load_flagship(res=(w, h), spp=spp, tri_budget=tris)
    n_rays = w * h * spp
    rkw = dict(spp=spp, max_depth=depth, rr_depth=4, steps=24,
               rounds_per_launch=32)

    diff_params = {
        "materials.base_color": scene.materials.base_color,
        "emitters.radiance": scene.emitters.radiance,
    }
    target = jnp.zeros((h, w, 3), jnp.float32)

    chunks = [int(c) for c in os.environ.get(
        "PROBE_CHUNKS", "131072,262144,524288").split(",")]
    # pad to the LCM of the chunk list so rows % chunk == 0 holds for every
    # entry, not only divisors of the max (ADVICE r2)
    import math

    pad_unit = math.lcm(*chunks)
    pad = ((n_rays + pad_unit - 1) // pad_unit) * pad_unit

    # record (compile + timed)
    rec = record_full(scene, 0, n_rays, n_lanes=65536, pad_to=pad, **rkw)
    jax.block_until_ready(rec.prim)
    t0 = time.perf_counter()
    rec = record_full(scene, 1, n_rays, n_lanes=65536, pad_to=pad, **rkw)
    jax.block_until_ready(rec.prim)
    t_rec = time.perf_counter() - t0
    print(f"record_full: {t_rec:.2f}s = {n_rays/t_rec:.0f} rays/s",
          flush=True)

    results = {"record_s": t_rec, "record_rays_s": n_rays / t_rec,
               "replay": {}}
    for chunk in chunks:
        g = replay_grads_full(scene, diff_params, update, target, 1, rec,
                              n_rays, chunk=chunk, spp=spp, max_depth=depth,
                              rr_depth=4, rfilter="box")
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        # same seed as the record (1): replay reconstructs camera jitter,
        # BSDF samples, and RR decisions from the seed, so a mismatched
        # seed yields garbage gradients (ADVICE r2).  Timing is unaffected
        # (jit keys on shapes, not values), so no cache-busting is needed.
        g = replay_grads_full(scene, diff_params, update, target, 1, rec,
                              n_rays, chunk=chunk, spp=spp, max_depth=depth,
                              rr_depth=4, rfilter="box")
        jax.block_until_ready(g)
        t_rep = time.perf_counter() - t0
        tot = t_rec + t_rep
        print(f"replay chunk={chunk}: {t_rep:.2f}s "
              f"(fwd+bwd {n_rays/tot:.0f} rays/s)", flush=True)
        results["replay"][chunk] = {
            "replay_s": t_rep, "fwdbwd_rays_s": n_rays / tot,
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
