"""Chip A/B: pipelined recorder vs single-path recorder (fwd+bwd lever —
record is ~90% of the fwd+bwd pipeline, BENCH.md round 3).

Flagship, records the full frame, asserts PathRecord equality (bit-exact
scheduling independence), then times both + the production replay.

Usage: python scripts/record_ab.py [depth] [steps_persistent] [steps_pipelined]
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
import jax.numpy as jnp

from mitsuba3_experiments_tpu.integrators.pipelined import (
    record_full_pipelined,
)
from mitsuba3_experiments_tpu.integrators.replay import (
    record_full,
    replay_grads,
)
from mitsuba3_experiments_tpu.scene.flagship import load_flagship
from mitsuba3_experiments_tpu.scene.params import update


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps_p = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    steps_2 = int(sys.argv[3]) if len(sys.argv) > 3 else 28
    w, h, spp = 1280, 720, 4
    scene, _ = load_flagship(res=(w, h), spp=spp, tri_budget=2_000_000)
    n_rays = w * h * spp
    chunk = 131072
    pad = ((n_rays + chunk - 1) // chunk) * chunk

    @jax.jit
    def _checksum(rec):
        """Position-sensitive wrapped-uint32 digests per field — lets the
        d65 A/B compare records without holding both (two depth-65
        PathRecords + the packed glob exceed HBM)."""
        n, d = rec.prim.shape
        mix = (jnp.arange(n, dtype=jnp.uint32)[:, None] * jnp.uint32(2654435761)
               + jnp.arange(d, dtype=jnp.uint32)[None, :] * jnp.uint32(40503))
        out = {}
        for f in ("prim", "u", "v", "occl"):
            a = getattr(rec, f)
            bits = (a.astype(jnp.uint32) if f in ("prim", "occl")
                    else jax.lax.bitcast_convert_type(a, jnp.uint32))
            out[f] = jnp.sum((bits ^ mix).astype(jnp.uint32))
        return out

    results = {"depth": depth}
    sums = {}
    rec = None
    for name, fn, stp in (("persistent", record_full, steps_p),
                          ("pipelined", record_full_pipelined, steps_2)):
        kw = dict(spp=spp, max_depth=depth, rr_depth=4, steps=stp,
                  rounds_per_launch=32, n_lanes=65536, pad_to=pad)
        del rec  # free the previous record before allocating the next
        rec = fn(scene, 1, n_rays, **kw)
        jax.block_until_ready(rec.prim)
        del rec
        t0 = time.perf_counter()
        rec = fn(scene, 1, n_rays, **kw)
        jax.block_until_ready(rec.prim)
        dt = time.perf_counter() - t0
        rate = n_rays / dt
        print(f"record {name} (steps={stp}): {dt:.2f}s = {rate:.0f} rays/s",
              flush=True)
        results[name] = {"record_s": dt, "rays_s": rate, "steps": stp}
        sums[name] = {k: int(v) for k, v in
                      jax.device_get(_checksum(rec)).items()}

    for f in ("prim", "u", "v", "occl"):
        eq = sums["persistent"][f] == sums["pipelined"][f]
        print(f"record field {f} digest: {'EQUAL' if eq else 'DIFFERS'}",
              flush=True)
        results[f"eq_{f}"] = eq

    # production replay on the winner's record (auto mode)
    diff_params = {
        "materials.base_color": scene.materials.base_color,
        "emitters.radiance": scene.emitters.radiance,
    }
    target = jnp.zeros((h, w, 3), jnp.float32)
    # `rec` still holds the pipelined record (recorded last)
    kw = dict(chunk=chunk, spp=spp, max_depth=depth, rr_depth=4,
              rfilter="box")
    g = replay_grads(scene, diff_params, update, target, 1, rec, n_rays,
                     **kw)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    g = replay_grads(scene, diff_params, update, target, 1, rec, n_rays,
                     **kw)
    jax.block_until_ready(g)
    t_rep = time.perf_counter() - t0
    best_rec = min(results["persistent"]["record_s"],
                   results["pipelined"]["record_s"])
    results["replay_s"] = t_rep
    results["fwdbwd_rays_s"] = n_rays / (best_rec + t_rep)
    print(f"replay(auto): {t_rep:.2f}s -> fwd+bwd "
          f"{results['fwdbwd_rays_s']:.0f} rays/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
