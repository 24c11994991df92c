"""Chip census probe for the pipelined scheduler: live-engine share +
total rows over a full flagship frame, plus the pipelined stepper's own
marginal iteration cost — the numbers that explain where the two-path
scheduler's idle-conversion gain goes.

Usage: python scripts/pipelined_census.py [steps] [lanes]
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

import dataclasses

import jax.numpy as jnp
import numpy as np

import mitsuba3_experiments_tpu.integrators.pipelined as pl
import mitsuba3_experiments_tpu.integrators.persistent as pp
from mitsuba3_experiments_tpu.core import math as m
from mitsuba3_experiments_tpu.scene.flagship import load_flagship


def _census_stepper(unified, n_nodes, lay, st, k, census):
    cl = pl._slot_major_closures(st)

    def body(_, carry):
        (ph, own, L, h_t, h_face, h_u, h_v,
         tro, trd, cur, sp, stack, t, face, u, v, census) = carry
        (ph, own, L, h_t, h_face, h_u, h_v, tro, trd, cur, sp, t, face,
         u, v) = pl._complete_and_arm(
            cl, ph, own, L, h_t, h_face, h_u, h_v,
            tro, trd, cur, sp, t, face, u, v,
        )
        census = census + jnp.stack(
            [jnp.sum((cur != pl.DONE).astype(jnp.int32)),
             jnp.int32(cur.shape[0])]
        )
        any_hit = pl._sel(ph, own) == pl.PH_SHADOW_R
        cur, sp, stack, t, face, u, v = pp._engine_step(
            unified, n_nodes, lay, True, tro, trd, any_hit,
            cur, sp, stack, t, face, u, v,
        )
        return (ph, own, L, h_t, h_face, h_u, h_v,
                tro, trd, cur, sp, stack, t, face, u, v, census)

    init = ((st.phase), st.own, (st.L),
            (st.h_t), (st.h_face), (st.h_u),
            (st.h_v),
            st.tr_o, st.tr_d, st.tr_cur, st.tr_sp, st.tr_stack, st.tr_t,
            st.tr_face, st.tr_u, st.tr_v, census)
    fin = jax.lax.fori_loop(0, k, body, init)
    st = dataclasses.replace(
        st, phase=(fin[0]), own=fin[1], L=(fin[2]),
        h_t=(fin[3]), h_face=(fin[4]),
        h_u=(fin[5]), h_v=(fin[6]), tr_o=fin[7],
        tr_d=fin[8], tr_cur=fin[9],
        tr_sp=fin[10], tr_stack=fin[11], tr_t=fin[12], tr_face=fin[13],
        tr_u=fin[14], tr_v=fin[15],
    )
    return st, fin[16]


@partial(
    jax.jit,
    static_argnames=("n_nodes", "spp", "max_depth", "rr_depth", "steps",
                     "n_rounds"),
    donate_argnums=(1, 2, 3),
)
def _run_counting(scene, st, rayL, next_ray, census, seed, ray_end,
                  unified, idx0, *, n_nodes, spp, max_depth, rr_depth,
                  steps, n_rounds):
    n_pad = jnp.uint32(rayL.shape[0] - 1)
    lay = scene.bvh.layout

    def one_round(carry, _):
        st, rayL, next_ray, census = carry
        st = pl._finish_round(st)
        st, rayL = pl._retire_pipelined(st, rayL,
                                        deferred_pad=(n_pad, idx0))
        st = pl._transition_pipelined(
            scene, st, seed, max_depth=max_depth, rr_depth=rr_depth
        )
        st, next_ray = pl._refill_pipelined(
            scene, st, next_ray, seed, spp=spp, ray_end=ray_end
        )
        st, census = _census_stepper(unified, n_nodes, lay, st, steps,
                                     census)
        return (st, rayL, next_ray, census), None

    (st, rayL, next_ray, census), _ = jax.lax.scan(
        one_round, (st, rayL, next_ray, census), None, length=n_rounds
    )
    return st, rayL, next_ray, census


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    w, h, spp = 1280, 720, 4
    rpl = 32
    scene, _ = load_flagship(res=(w, h), spp=spp, tri_budget=2_000_000)
    unified, n_nodes = pp.unify_tables(scene.bvh)
    lay = scene.bvh.layout
    n_total = w * h * spp

    # marginal iteration cost of the PIPELINED stepper on a saturated state
    st = pl.PipelinedState.empty(lanes, stack_depth=lay.stack)
    nr = jnp.zeros((), jnp.uint32)
    st, nr = pl._refill_pipelined(scene, st, nr, jnp.uint32(1), spp=spp,
                                  ray_end=jnp.uint32(n_total))
    stepper = jax.jit(lambda st: pl._stepper(unified, n_nodes, st, 64,
                                             layout=lay))
    s2 = stepper(st)
    jax.block_until_ready(s2.tr_t)
    t0 = time.perf_counter()
    s2 = stepper(st)
    jax.block_until_ready(s2.tr_t)
    dt = time.perf_counter() - t0
    print(f"# pipelined stepper marginal: {dt*1e3/64:.3f} ms/iter @ "
          f"{lanes} lanes ({lanes*64/dt/1e6:.1f}M rows/s)", flush=True)

    st = pl.PipelinedState.empty(lanes, stack_depth=lay.stack)
    rayL = jnp.zeros((n_total + 1, 3), m.Float)
    next_ray = jnp.zeros((), jnp.uint32)
    kw = dict(n_nodes=n_nodes, spp=spp, max_depth=depth, rr_depth=4,
              steps=steps, n_rounds=rpl)
    live = tot = 0
    t0 = time.perf_counter()
    while True:
        census = jnp.zeros((2,), jnp.int32)
        st, rayL, next_ray, census = _run_counting(
            scene, st, rayL, next_ray, census, jnp.uint32(1),
            jnp.uint32(n_total), unified, jnp.uint32(0), **kw,
        )
        c = np.asarray(census)
        live += int(c[0])
        tot += int(c[1])
        n_alive = int(jnp.sum((st.phase != pl.PH_DEAD).astype(jnp.int32)))
        if int(next_ray) >= n_total and n_alive == 0:
            break
    t_frame = time.perf_counter() - t0
    out = {
        "scheduler": "pipelined", "steps": steps, "lanes": lanes,
        "stepper_ms_per_iter": dt * 1e3 / 64,
        "live_share": live / tot,
        "active_rows_per_ray": live / n_total,
        "total_rows_per_ray": tot / n_total,
        "frame_s_counting": t_frame,
    }
    print(f"# live share {out['live_share']*100:.1f}%, active "
          f"{out['active_rows_per_ray']:.1f} rows/ray, total "
          f"{out['total_rows_per_ray']:.1f}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
