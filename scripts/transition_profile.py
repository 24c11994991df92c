"""Sub-profile of the persistent renderer's P_TRACE transition on the TPU.

Times the pieces of _transition_trace separately (emission-MIS block, NEE
emitter sampling, BSDF eval_pdf_sample, the state commit) on a realistic
mid-render state so the 15 ms (BENCH.md) has a named owner.

Usage: python scripts/transition_profile.py [n_lanes] [steps]
"""
import os
import sys
import time
from functools import partial
from types import SimpleNamespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from mitsuba3_experiments_tpu.core.records import BSDFFlags, Ray, has_flag
from mitsuba3_experiments_tpu.integrators import persistent as pp
from mitsuba3_experiments_tpu.integrators.wavefront import _rand
from mitsuba3_experiments_tpu.intersect.bvh_jax import _make_si
from mitsuba3_experiments_tpu.render import bsdf as bsdflib
from mitsuba3_experiments_tpu.render import film as filmlib
from mitsuba3_experiments_tpu.render.emitter import (
    eval_emitter,
    pdf_emitter_direction,
    sample_emitter_direction,
)
from mitsuba3_experiments_tpu.scene.flagship import load_flagship

n_lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16

print("device:", jax.devices()[0], flush=True)
scene = load_flagship(res=(1280, 720), spp=4, tri_budget=2_000_000)[0]
unified, n_nodes = pp.unify_tables(scene.bvh)
n_total = 1280 * 720 * 4

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
print("# state warmed; alive:", int(jnp.sum(st.alive)), flush=True)

mats, tex = scene.materials, scene.textures


@jax.jit
def stage_si(st):
    ray = Ray.make(st.tr_o, st.tr_d)
    t_out = jnp.where(st.tr_face >= 0, st.tr_t, jnp.inf)
    return _make_si(scene, ray, t_out, st.tr_face, st.tr_u, st.tr_v)


@jax.jit
def stage_emission(st):
    doneA = st.alive & (st.phase == pp.P_TRACE) & (st.tr_cur == pp.DONE)
    si = stage_si(st)
    hit = doneA & si.valid
    ref = SimpleNamespace(p=st.prev_p)
    gate = doneA & (st.prev_pdf > 0.0)
    em_pdf = pdf_emitter_direction(scene, ref, si, gate & ~st.prev_delta)
    return em_pdf, eval_emitter(scene, si, hit)


@jax.jit
def stage_nee(st):
    doneA = st.alive & (st.phase == pp.P_TRACE) & (st.tr_cur == pp.DONE)
    si = stage_si(st)
    hit = doneA & si.valid
    cont = hit & (st.depth < 8)
    base = jnp.uint32(2) + jnp.uint32(6) * (st.depth - 1).astype(jnp.uint32)
    flags = bsdflib.bsdf_flags(mats, si.mat_id)
    active_em = cont & has_flag(flags, BSDFFlags.Smooth)
    u_em = _rand(seed, st.idx, base, 2)
    ds, em_weight = sample_emitter_direction(scene, si, u_em, False, active_em)
    return ds.pdf, em_weight


@jax.jit
def stage_bsdf(st):
    doneA = st.alive & (st.phase == pp.P_TRACE) & (st.tr_cur == pp.DONE)
    si = stage_si(st)
    hit = doneA & si.valid
    cont = hit & (st.depth < 8)
    base = jnp.uint32(2) + jnp.uint32(6) * (st.depth - 1).astype(jnp.uint32)
    wo = si.to_local(st.next_d)  # any direction works for timing
    u1 = _rand(seed, st.idx, base + jnp.uint32(2), 1)
    u2 = _rand(seed, st.idx, base + jnp.uint32(3), 2)
    return bsdflib.eval_pdf_sample(mats, tex, si, wo, u1, u2, cont)


trans_a = jax.jit(partial(pp._transition_trace, max_depth=8, rr_depth=4))


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
def stage_noop(st):
    # fixed per-launch cost on the same input state: dispatch + state load
    return st.tr_face + 1, st.tr_t * 2.0


@jax.jit
def stage_gather1(st):
    # ONE dependent row gather (the minimum memory-latency program)
    row = jnp.take(scene.geometry.face_packed,
                   jnp.maximum(st.tr_face, 0), axis=0)
    return jnp.sum(row, axis=-1)


t_no = timeit("noop (dispatch+state)", stage_noop, st)
t_g1 = timeit("one row gather", stage_gather1, st)
t_si = timeit("make_si only", stage_si, st)
t_em = timeit("si + emission MIS", stage_emission, st)
t_ne = timeit("si + NEE emitter sample", stage_nee, st)
t_bs = timeit("si + bsdf eval_pdf_sample", stage_bsdf, st)
t_full = timeit("full _transition_trace", trans_a, scene, st, seed)
print(f"# attribution (noop-corrected): noop={t_no:.2f} "
      f"gather1={t_g1 - t_no:.2f} si={t_si - t_no:.2f} "
      f"em={t_em - t_si:.2f} nee={t_ne - t_si:.2f} bsdf={t_bs - t_si:.2f} "
      f"other={t_full - t_em - t_ne - t_bs + 2 * t_si:.2f}", flush=True)
