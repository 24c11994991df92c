"""Split the pipelined round-boundary block into its four parts on chip.

round_split_probe v2 measured the d65 boundary at 15.78 ms/round — 26% of
the steps=48 round and the reason shorter rounds (which would convert the
40.5% idle pool) lose.  This probe names the owners: scans of boundary-only
rounds with parts progressively enabled, differenced across n_rounds (same
methodology — no per-round dispatch, no bulk host copies).

  A: finish_round only
  B: finish + retire
  C: finish + retire + refill
  D: finish + retire + transition + refill   (the full boundary)

Usage: python scripts/round_parts_probe.py [depth] [lanes]
"""
import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import mitsuba3_experiments_tpu.integrators.persistent as pp
import mitsuba3_experiments_tpu.integrators.pipelined as pl
from mitsuba3_experiments_tpu.core import math as m
from mitsuba3_experiments_tpu.scene.flagship import load_flagship


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 65
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    w, h, spp = 1280, 720, 4
    print("device:", jax.devices()[0], flush=True)
    scene, _ = load_flagship(res=(w, h), spp=spp, tri_budget=2_000_000)
    unified, n_nodes = pp.unify_tables(scene.bvh)
    n_total = w * h * spp
    seed = jnp.uint32(1)

    st = pl.PipelinedState.empty(lanes, stack_depth=scene.bvh.layout.stack)
    rayL = jnp.zeros((n_total + 1, 3), m.Float)
    next_ray = jnp.zeros((), jnp.uint32)
    st, rayL, next_ray = pl._run_pipelined(
        scene, st, rayL, next_ray, seed, jnp.uint32(n_total), unified,
        jnp.uint32(0), n_nodes=n_nodes, spp=spp, max_depth=depth,
        rr_depth=4, steps=48, n_rounds=12,
    )
    jax.block_until_ready(st.phase)
    print("# warmed", flush=True)
    n_pad = jnp.uint32(n_total)
    idx0 = jnp.uint32(0)

    @partial(jax.jit, static_argnames=("mode", "n_rounds"),
             donate_argnums=(0, 1, 2))
    def run(st, rayL, next_ray, *, mode: str, n_rounds: int):
        def one_round(carry, _):
            st, rayL, next_ray = carry
            st = pl._finish_round(st)
            if "retire" in mode:
                st, rayL = pl._retire_pipelined(
                    st, rayL, deferred_pad=(n_pad, idx0))
            if "trans" in mode:
                st = pl._transition_pipelined(
                    scene, st, seed, max_depth=depth, rr_depth=4)
            if "refill" in mode:
                st, next_ray = pl._refill_pipelined(
                    scene, st, next_ray, seed, spp=spp,
                    ray_end=jnp.uint32(n_total))
            return (st, rayL, next_ray), None

        (st, rayL, next_ray), _ = jax.lax.scan(
            one_round, (st, rayL, next_ray), None, length=n_rounds)
        return st, rayL, next_ray

    def copy_state():
        return (jax.tree_util.tree_map(lambda a: a + 0, st), rayL + 0.0,
                next_ray + 0)

    def timed(mode, n_rounds, reps=3):
        c = copy_state()
        out = run(c[0], c[1], c[2], mode=mode, n_rounds=n_rounds)
        jax.block_until_ready(out[0].phase)
        best = np.inf
        for _ in range(reps):
            c = copy_state()
            jax.block_until_ready(c[0].phase)
            t0 = time.perf_counter()
            o = run(c[0], c[1], c[2], mode=mode, n_rounds=n_rounds)
            float(jnp.sum(o[0].tr_t))
            best = min(best, time.perf_counter() - t0)
        return best

    res = {}
    for mode in ("finish", "finish+retire", "finish+retire+refill",
                 "finish+retire+trans+refill"):
        t8 = timed(mode, 16)
        t16 = timed(mode, 32)
        res[mode] = (t16 - t8) / 16.0
        print(f"# {mode:28s}: {res[mode]*1e3:7.3f} ms/round", flush=True)

    parts = {
        "finish": res["finish"],
        "retire": res["finish+retire"] - res["finish"],
        "refill": res["finish+retire+refill"] - res["finish+retire"],
        "transition": res["finish+retire+trans+refill"]
        - res["finish+retire+refill"],
    }
    for k, v in parts.items():
        print(f"# {k:12s}: {v*1e3:7.3f} ms")
    print(json.dumps({"depth": depth, "lanes": lanes,
                      **{k: v * 1e3 for k, v in parts.items()},
                      "boundary_total_ms":
                          res["finish+retire+trans+refill"] * 1e3}))


if __name__ == "__main__":
    main()
