"""Round-composition split for the pipelined machine on the chip, v2.

v1 timed individual boundary jits and was dominated by a ~67 ms fixed
axon-tunnel host-transfer per call (finish_round alone "measured" 69.8 ms
— the 512 KB leaf copy, not compute).  v2 measures what production runs:
`_run_pipelined` scans (rounds inside jit — no per-round dispatch or
transfer), differenced across n_rounds to get the true per-round cost and
across steps to split it into stepper marginal vs boundary block:

  per_round(s)   = [T(2R, s) - T(R, s)] / R
  marginal       = [per_round(s1) - per_round(s0)] / (s1 - s0)
  boundary_ms    = per_round(s) - s * marginal

All timings on a warmed MID-RENDER state (freshly-refilled states inflate
the stepper: every lane gathers the duplicate root row, the 1.45x
bank-conflict regime of the round-3 probe).

Usage: python scripts/round_split_probe.py [depth] [lanes] [s0] [s1]
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
import numpy as np

import mitsuba3_experiments_tpu.integrators.persistent as pp
import mitsuba3_experiments_tpu.integrators.pipelined as pl
from mitsuba3_experiments_tpu.core import math as m
from mitsuba3_experiments_tpu.scene.flagship import load_flagship


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 65
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    s0 = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    s1 = int(sys.argv[4]) if len(sys.argv) > 4 else 48
    w, h, spp = 1280, 720, 4
    print("device:", jax.devices()[0], flush=True)
    scene, _ = load_flagship(res=(w, h), spp=spp, tri_budget=2_000_000)
    unified, n_nodes = pp.unify_tables(scene.bvh)
    lay = scene.bvh.layout
    n_total = w * h * spp
    seed = jnp.uint32(1)

    # warm a mid-render state: run real rounds so phases/depths are typical
    st = pl.PipelinedState.empty(lanes, stack_depth=lay.stack)
    rayL = jnp.zeros((n_total + 1, 3), m.Float)
    next_ray = jnp.zeros((), jnp.uint32)
    st, rayL, next_ray = pl._run_pipelined(
        scene, st, rayL, next_ray, seed, jnp.uint32(n_total), unified,
        jnp.uint32(0), n_nodes=n_nodes, spp=spp, max_depth=depth,
        rr_depth=4, steps=s1, n_rounds=12,
    )
    jax.block_until_ready(st.phase)
    print("# warmed 12 rounds", flush=True)

    def copy_state():
        return (
            jax.tree_util.tree_map(lambda a: a + 0, st),
            rayL + 0.0,
            next_ray + 0,
        )

    def timed_run(steps, n_rounds, reps=3):
        kw = dict(n_nodes=n_nodes, spp=spp, max_depth=depth, rr_depth=4,
                  steps=steps, n_rounds=n_rounds)
        # compile + warm
        c = copy_state()
        out = pl._run_pipelined(scene, c[0], c[1], c[2], seed,
                                jnp.uint32(n_total), unified,
                                jnp.uint32(0), **kw)
        jax.block_until_ready(out[0].phase)
        best = np.inf
        for _ in range(reps):
            c = copy_state()
            jax.block_until_ready(c[0].phase)
            t0 = time.perf_counter()
            o = pl._run_pipelined(scene, c[0], c[1], c[2], seed,
                                  jnp.uint32(n_total), unified,
                                  jnp.uint32(0), **kw)
            # sync via a device-side scalar, not a bulk leaf copy (the
            # v1 lesson: a 512 KB host copy through the tunnel is ~67 ms)
            float(jnp.sum(o[0].tr_t))
            best = min(best, time.perf_counter() - t0)
        return best

    res = {}
    for s in (s0, s1):
        tR = timed_run(s, 8)
        t2R = timed_run(s, 16)
        res[s] = (t2R - tR) / 8.0
        print(f"# steps={s}: T(8r)={tR*1e3:.1f} ms  T(16r)={t2R*1e3:.1f} ms"
              f"  per-round={res[s]*1e3:.2f} ms", flush=True)

    marginal = (res[s1] - res[s0]) / (s1 - s0)
    boundary = res[s1] - s1 * marginal
    print(f"# stepper marginal: {marginal*1e3:.3f} ms/iter "
          f"({lanes/marginal/1e6:.1f}M rows/s, "
          f"{marginal/lanes*1e9:.2f} ns/row)")
    print(f"# boundary block:   {boundary*1e3:.2f} ms/round "
          f"(share at steps={s1}: {boundary/res[s1]*100:.1f}%, "
          f"at steps={s0}: {boundary/res[s0]*100:.1f}%)")
    print(json.dumps({
        "depth": depth, "lanes": lanes,
        "per_round_ms": {str(s): res[s] * 1e3 for s in res},
        "marginal_ms_per_iter": marginal * 1e3,
        "ns_per_row": marginal / lanes * 1e9,
        "boundary_ms": boundary * 1e3,
    }))


if __name__ == "__main__":
    main()
