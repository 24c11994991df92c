"""Per-stage timing of the persistent renderer's round on the TPU.

Times, at a realistic mid-render state: the traversal stepper alone
(per-iteration cost), each transition, and the refill — so optimization
targets are measured, not guessed.

Usage: python scripts/persistent_profile.py [n_lanes] [steps]
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

from mitsuba3_experiments_tpu.integrators import persistent as pp
from mitsuba3_experiments_tpu.scene.flagship import load_flagship

n_lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16

print("device:", jax.devices()[0], flush=True)
scene = load_flagship(res=(1280, 720), spp=4, tri_budget=2_000_000)[0]
unified, n_nodes = pp.unify_tables(scene.bvh)
n_total = 1280 * 720 * 4

# build a realistic mid-render state: run a few fused rounds first
from mitsuba3_experiments_tpu.render import film as filmlib

rayL = jnp.zeros((n_total + 1, 3), jnp.float32)
st = pp.PersistentState.empty(n_lanes)
next_ray = jnp.zeros((), jnp.uint32)
seed = jnp.uint32(7)
st, rayL, next_ray = pp._run_persistent(
    scene, st, rayL, next_ray, seed, jnp.uint32(n_total), unified,
    jnp.uint32(0), n_nodes=n_nodes, spp=4, max_depth=8, rr_depth=4,
    steps=steps, n_rounds=12,
)
jax.block_until_ready(st.alive)
n_alive = int(jnp.sum(st.alive))
n_live = int(jnp.sum(st.alive & (st.tr_cur != pp.DONE)))
ph = [int(jnp.sum(st.alive & (st.phase == p))) for p in (0, 1, 2)]
print(f"# state warmed; alive {n_alive}  in-flight {n_live} "
      f"({100*n_live/max(n_alive,1):.0f}%)  phase T/S/R {ph}", flush=True)

stepper = jax.jit(partial(pp._trav_steps, k=steps), static_argnames=("n_nodes",))
trans_b = jax.jit(partial(
    pp._retire, deferred_pad=(jnp.uint32(n_total), jnp.uint32(0))
))
trans_a = jax.jit(partial(pp._transition_trace, max_depth=8, rr_depth=4))
refill = jax.jit(partial(pp._refill_persistent, spp=4))


def timeit(label, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


@jax.jit
def noop(s):
    return s.tr_face + 1, s.tr_t * 2.0


stepper1 = jax.jit(partial(pp._trav_steps, k=1), static_argnames=("n_nodes",))

t_no = timeit("noop (dispatch+state)", noop, st)
t_s1 = timeit("stepper x1", lambda s: stepper1(unified, n_nodes=n_nodes, st=s), st)
t_step = timeit("stepper x%d" % steps, lambda s: stepper(unified, n_nodes=n_nodes, st=s), st)
t_b = timeit("retire", lambda s: trans_b(scene, s, rayL)[0], st)
t_a = timeit("transition_trace", lambda s: trans_a(scene, s, seed), st)
t_r = timeit("refill", lambda s: refill(scene, s, next_ray, seed, ray_end=jnp.uint32(n_total))[0], st)
print(f"# per-iteration stepper cost: {t_step/steps:.3f} ms "
      f"(marginal {(t_step - t_s1) / (steps - 1):.3f} ms, "
      f"noop baseline {t_no:.2f} ms)", flush=True)
print(f"# round = stepper {t_step:.1f} + transitions {t_a+t_b:.1f} + refill {t_r:.1f} ms", flush=True)


# occupancy decay across one round: fraction of lanes still traversing
# after each stepper iteration (idle lanes still pay the ~12.3 ns/row
# gather, so the area above this curve is the round's wasted gather rows).
# Start from a true round START: retire + transition + refill first.
s2 = trans_b(scene, st, rayL)[0]
s2 = trans_a(scene, s2, seed)
s2 = refill(scene, s2, next_ray, seed, ray_end=jnp.uint32(n_total))[0]
occ = []
for _ in range(steps):
    s2 = stepper1(unified, n_nodes=n_nodes, st=s2)
    occ.append(int(jnp.sum(s2.alive & (s2.tr_cur != pp.DONE))))
tot = max(int(jnp.sum(s2.alive)), 1)
print("# occupancy/iter:", " ".join(f"{o/tot:.2f}" for o in occ), flush=True)
waste = 1.0 - sum(occ) / (len(occ) * tot)
print(f"# idle-lane share of round gather rows: {100*waste:.0f}%", flush=True)
