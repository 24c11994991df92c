"""Round-composition split for the pipelined machine on the chip.

Times, on a realistic warmed mid-render state at the given depth spec:
  1. the stepper alone (k iterations, jitted),
  2. the round-BOUNDARY block alone (finish_round + retire + transition +
     refill, jitted together),
  3. a full round (boundary + stepper(k)),
so the steps-per-round optimum's driving ratio — boundary cost vs idle
cost — has measured owners.  The d65 steps=48 optimum holds 40.5% idle
(BENCH.md census); whether shorter rounds can convert it depends entirely
on the boundary block's price, which this probe names.

Usage: python scripts/round_split_probe.py [depth] [lanes] [steps]
"""
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


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        # host-copy one leaf: block_until_ready alone can report ~0.1 ms
        # spuriously for repeat identical calls through the axon tunnel
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[..., :1] if hasattr(leaf, "shape") and leaf.ndim
                   else leaf)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 65
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    w, h, spp = 1280, 720, 4
    print("device:", jax.devices()[0], flush=True)
    scene, _ = load_flagship(res=(w, h), spp=spp, tri_budget=2_000_000)
    unified, n_nodes = pp.unify_tables(scene.bvh)
    lay = scene.bvh.layout
    n_total = w * h * spp
    n_pad = jnp.uint32(n_total)
    rayL = jnp.zeros((n_total + 1, 3), m.Float)
    seed = jnp.uint32(1)
    idx0 = jnp.uint32(0)

    # warm a mid-render state: run real rounds so phases/depths are typical
    st = pl.PipelinedState.empty(lanes, stack_depth=lay.stack)
    next_ray = jnp.zeros((), jnp.uint32)
    st, rayL, next_ray = pl._run_pipelined(
        scene, st, rayL, next_ray, seed, jnp.uint32(n_total), unified,
        idx0, n_nodes=n_nodes, spp=spp, max_depth=depth, rr_depth=4,
        steps=steps, n_rounds=12,
    )
    jax.block_until_ready(st.phase)
    print("# warmed 12 rounds", flush=True)

    stepper = jax.jit(partial(pl._stepper, unified, n_nodes, layout=lay),
                      static_argnames=("k",))

    @jax.jit
    def boundary(st, rayL, next_ray):
        st = pl._finish_round(st)
        st, rayL = pl._retire_pipelined(st, rayL,
                                        deferred_pad=(n_pad, idx0))
        st = pl._transition_pipelined(scene, st, seed, max_depth=depth,
                                      rr_depth=4)
        st, next_ray = pl._refill_pipelined(
            scene, st, next_ray, seed, spp=spp,
            ray_end=jnp.uint32(n_total))
        return st, rayL, next_ray

    @jax.jit
    def boundary_pieces(st, rayL, next_ray):
        st = pl._finish_round(st)
        return st, rayL, next_ray

    t_fin, _ = bench(boundary_pieces, st, rayL, next_ray)

    @jax.jit
    def b_retire(st, rayL):
        st2 = pl._finish_round(st)
        return pl._retire_pipelined(st2, rayL, deferred_pad=(n_pad, idx0))

    t_ret, _ = bench(b_retire, st, rayL)

    @jax.jit
    def b_trans(st):
        return pl._transition_pipelined(
            scene, pl._finish_round(st), seed, max_depth=depth,
            rr_depth=4)

    t_tr, _ = bench(b_trans, st)

    t_bnd, (st2, rayL2, nr2) = bench(boundary, st, rayL, next_ray)
    t_step, _ = bench(lambda s: stepper(st=s, k=steps), st2)
    t_step1, _ = bench(lambda s: stepper(st=s, k=1), st2)

    marginal = (t_step - t_step1) / (steps - 1)
    print(f"# finish_round:            {t_fin*1e3:8.2f} ms")
    print(f"# finish+retire:           {t_ret*1e3:8.2f} ms")
    print(f"# finish+transition:       {t_tr*1e3:8.2f} ms")
    print(f"# boundary total:          {t_bnd*1e3:8.2f} ms")
    print(f"# stepper k={steps}:       {t_step*1e3:8.2f} ms "
          f"({marginal*1e3:.3f} ms/iter marginal, "
          f"{lanes*(steps-1)/ (t_step - t_step1) / 1e6:.1f}M rows/s)")
    print(f"# round total:             {(t_bnd+t_step)*1e3:8.2f} ms; "
          f"boundary share {t_bnd/(t_bnd+t_step)*100:.1f}%")
    import json
    print(json.dumps({
        "depth": depth, "lanes": lanes, "steps": steps,
        "finish_ms": t_fin * 1e3, "finish_retire_ms": t_ret * 1e3,
        "finish_transition_ms": t_tr * 1e3, "boundary_ms": t_bnd * 1e3,
        "stepper_ms": t_step * 1e3, "marginal_ms_per_iter": marginal * 1e3,
        "boundary_share": t_bnd / (t_bnd + t_step),
    }))


if __name__ == "__main__":
    main()
