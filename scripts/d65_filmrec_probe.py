"""Chip probe: d65 fwd+bwd with film-from-record (round-4 session 2).

The sorted replay at depth 65 pays TWO passes (forward film + adjoint);
the recorder now flushes each retired slot's radiance, so the forward
film is a free byproduct (record_full_pipelined(return_film=True)) and
the sorted replay runs adjoint-only.  Measures:

  1. record (return_film) at steps from argv (default 32, 40 sweep —
     the steps=32 optimum was tuned at depth 8; deeper paths may prefer
     a different round length),
  2. sorted replay with the recorded film (adjoint-only),
  3. the composed fwd+bwd rate vs the 125.2k headline-companion record.

Usage: python scripts/d65_filmrec_probe.py [depth] [steps...]
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

import jax.numpy as jnp

from mitsuba3_experiments_tpu.integrators.pipelined import (
    record_full_pipelined,
)
from mitsuba3_experiments_tpu.integrators.replay import replay_grads
from mitsuba3_experiments_tpu.scene.flagship import load_flagship
from mitsuba3_experiments_tpu.scene.params import update


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 65
    steps_list = [int(s) for s in sys.argv[2:]] or [32, 40]
    w, h, spp = 1280, 720, 4
    scene, _ = load_flagship(res=(w, h), spp=spp, tri_budget=2_000_000)
    n_rays = w * h * spp
    chunk = 131072
    pad = ((n_rays + chunk - 1) // chunk) * chunk
    params = {
        "materials.base_color": scene.materials.base_color,
        "emitters.radiance": scene.emitters.radiance,
    }
    target = jnp.zeros((h, w, 3), jnp.float32)

    results = {"depth": depth}
    best = None
    for steps in steps_list:
        kw = dict(spp=spp, max_depth=depth, rr_depth=4, steps=steps,
                  rounds_per_launch=32, n_lanes=65536, pad_to=pad,
                  return_film=True, rfilter="box")
        rec, film = record_full_pipelined(scene, 1, n_rays, **kw)
        jax.block_until_ready(film)
        del rec, film
        t0 = time.perf_counter()
        rec, film = record_full_pipelined(scene, 1, n_rays, **kw)
        jax.block_until_ready(film)
        dt_rec = time.perf_counter() - t0
        print(f"record+film steps={steps}: {dt_rec:.2f}s = "
              f"{n_rays/dt_rec:.0f} rays/s", flush=True)
        results[f"record_s_steps{steps}"] = dt_rec
        if best is None or dt_rec < best[1]:
            best = (steps, dt_rec, rec, film)
        else:
            del rec, film

    steps, dt_rec, rec, film = best
    rkw = dict(chunk=chunk, spp=spp, max_depth=depth, rr_depth=4,
               rfilter="box", mode="sorted")
    g = replay_grads(scene, params, update, target, 1, rec, n_rays,
                     film=film, **rkw)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    g = replay_grads(scene, params, update, target, 1, rec, n_rays,
                     film=film, **rkw)
    jax.block_until_ready(g)
    dt_rpl = time.perf_counter() - t0
    total = dt_rec + dt_rpl
    print(f"sorted replay (film-from-record): {dt_rpl:.2f}s", flush=True)
    print(f"fwd+bwd d{depth}: record {dt_rec:.2f} + replay {dt_rpl:.2f} "
          f"= {total:.2f}s -> {n_rays/total:.0f} rays/s", flush=True)
    results.update(best_steps=steps, replay_s=dt_rpl,
                   fwdbwd_rays_s=n_rays / total)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
