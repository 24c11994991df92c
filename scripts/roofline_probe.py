"""Roofline ledger probe (VERDICT r3 #5): measure, on the real chip,

  1. the dependent-gather row floor (rows/s) of the persistent stepper —
     timed on the saturated machine itself, not a synthetic probe;
  2. active vs total row gathers per camera ray over a full flagship
     frame (census counters threaded through _trav_steps);

and derive the architectural ceiling

  fwd_ceiling_rays_s  = floor_rows_per_s / active_rows_per_ray

("if every gathered row belonged to a live lane").  The headline bench
reports itself as a % of this (bench.py extra.pct_of_ceiling_*) — the
honest MFU analog, since the reference publishes no numbers to beat
(BASELINE "published": {}).  fwd+bwd ceiling composes the record ceiling
with the MEASURED replay rate (the replay is MXU/VPU-bound, not
gather-bound; its own roofline is out of scope):

  fwdbwd_ceiling = 1 / (active_rows_per_ray / floor + 1 / replay_rays_s)

Usage: python scripts/roofline_probe.py [depth] [replay_rays_s]
Writes/merges roofline.json key "d{depth}".
"""
import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import mitsuba3_experiments_tpu.integrators.persistent as pp
from mitsuba3_experiments_tpu.core import math as m
from mitsuba3_experiments_tpu.scene.flagship import load_flagship


@partial(
    jax.jit,
    static_argnames=("n_nodes", "spp", "max_depth", "rr_depth", "steps",
                     "n_rounds"),
    donate_argnums=(1, 2, 3),
)
def _run_counting(scene, st, rayL, next_ray, census, seed, ray_end,
                  unified, idx0, *, n_nodes, spp, max_depth, rr_depth,
                  steps, n_rounds):
    """pp._run_persistent with the census threaded (probe-only copy; the
    production round loop stays census-free)."""
    n_pad = jnp.uint32(rayL.shape[0] - 1)
    layout = scene.bvh.layout

    def one_round(carry, _):
        st, rayL, next_ray, census = carry
        st, rayL = pp._retire(scene, st, rayL, deferred_pad=(n_pad, idx0))
        st = pp._transition_trace(
            scene, st, seed, max_depth=max_depth, rr_depth=rr_depth
        )
        st, next_ray = pp._refill_persistent(
            scene, st, next_ray, seed, spp=spp, ray_end=ray_end
        )
        st, census = pp._trav_steps(
            unified, n_nodes, st, steps, layout=layout, census=census
        )
        return (st, rayL, next_ray, census), None

    (st, rayL, next_ray, census), _ = jax.lax.scan(
        one_round, (st, rayL, next_ray, census), None, length=n_rounds
    )
    return st, rayL, next_ray, census


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replay_rays_s = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    w, h, spp = 1280, 720, 4
    n_lanes, steps, rpl = 65536, 20, 32
    scene, _ = load_flagship(res=(w, h), spp=spp, tri_budget=2_000_000)
    unified, n_nodes = pp.unify_tables(scene.bvh)
    lay = scene.bvh.layout
    n_total = w * h * spp

    # ---- 1. row floor: saturated stepper marginal ----
    st = pp.PersistentState.empty(n_lanes, stack_depth=lay.stack)
    st, _ = pp._refill_persistent(
        scene, st, jnp.uint32(0), jnp.uint32(1), spp=spp,
        ray_end=jnp.uint32(n_total),
    )
    stepper = jax.jit(
        partial(pp._trav_steps, k=64, layout=lay),
        static_argnames=("n_nodes",),
    )
    s2 = stepper(unified, n_nodes, st)
    jax.block_until_ready(s2.tr_t)
    t0 = time.perf_counter()
    s2 = stepper(unified, n_nodes, st)
    jax.block_until_ready(s2.tr_t)
    dt = time.perf_counter() - t0
    floor_rows_per_s = (n_lanes * 64) / dt
    print(f"# stepper floor: {dt*1e3/64:.3f} ms/iter @ {n_lanes} lanes "
          f"= {floor_rows_per_s/1e6:.1f}M rows/s", flush=True)

    # ---- 2. census over a full frame ----
    rayL = jnp.zeros((n_total + 1, 3), m.Float)
    st = pp.PersistentState.empty(n_lanes, stack_depth=lay.stack)
    next_ray = jnp.zeros((), jnp.uint32)
    kw = dict(n_nodes=n_nodes, spp=spp, max_depth=depth, rr_depth=4,
              steps=steps, n_rounds=rpl)
    # int32 device counters reset per launch, accumulated in host ints
    # (a whole frame is ~1e9 rows — past int32 — but one launch is ~42M)
    live_rows = total_rows = 0
    t0 = time.perf_counter()
    while True:
        census = jnp.zeros((2,), jnp.int32)
        st, rayL, next_ray, census = _run_counting(
            scene, st, rayL, next_ray, census, jnp.uint32(1),
            jnp.uint32(n_total), unified, jnp.uint32(0), **kw,
        )
        c = np.asarray(census)
        live_rows += int(c[0]); total_rows += int(c[1])
        n_alive, cursor = jax.device_get(pp._poll(st, next_ray))
        if int(cursor) >= n_total and int(n_alive) == 0:
            break
    t_frame = time.perf_counter() - t0
    act_per_ray = live_rows / n_total
    tot_per_ray = total_rows / n_total
    idle = 1.0 - live_rows / total_rows
    fwd_ceiling = floor_rows_per_s / act_per_ray
    out = {
        "floor_rows_per_s": floor_rows_per_s,
        "active_rows_per_ray": act_per_ray,
        "total_rows_per_ray": tot_per_ray,
        "idle_share": idle,
        "fwd_ceiling_rays_s": fwd_ceiling,
        "frame_s_counting": t_frame,
        "config": {"lanes": n_lanes, "steps": steps, "rpl": rpl,
                   "spp": spp, "depth": depth},
    }
    if replay_rays_s > 0:
        out["replay_rays_s"] = replay_rays_s
        out["fwdbwd_ceiling_rays_s"] = 1.0 / (
            act_per_ray / floor_rows_per_s + 1.0 / replay_rays_s
        )
    print(f"# d{depth}: active {act_per_ray:.1f} rows/ray, total "
          f"{tot_per_ray:.1f} (idle {idle*100:.1f}%), fwd ceiling "
          f"{fwd_ceiling:.0f} rays/s", flush=True)

    path = os.path.join(REPO, "roofline.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[f"d{depth}"] = out
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps({f"d{depth}": out}))


if __name__ == "__main__":
    main()
