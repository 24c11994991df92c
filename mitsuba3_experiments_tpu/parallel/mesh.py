"""Multi-chip parallelism: ray/tile data parallelism over a device mesh.

The reference has zero distributed code (SURVEY.md section 2.3) — its only
parallel axis is the SIMT wavefront.  On TPU that axis shards across chips:

  * mesh ("dp",) over all devices (ICI within a slice, DCN across hosts via
    jax.distributed.initialize — same code path).
  * scene/BVH/NN parameters replicated per chip (HBM-resident).
  * the wavefront (ray lanes) sharded over "dp"; each device traces its lanes
    and splats into a *local* film copy; films merge with one psum at the end
    (film is small vs ray state, and psum rides the ICI all-reduce).
  * gradients of scene/NN parameters all-reduce with psum inside the
    backward shard_map — the NCCL-all-reduce analog of BASELINE.md.
"""
from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core import math as m
from ..core.rng import Sampler
from ..render import film as filmlib
from ..render import sensor as sensorlib
from ..scene.params import update as scene_update


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), ("dp",))


def _trace_lanes(scene, integrator, seed, pass_idx, lane, spp_per_pass,
                 rfilter, film_shape):
    """Trace a block of lanes and return the (partial) film they splat."""
    w, h = scene.camera.resolution
    pix = lane // spp_per_pass
    px = (pix % w).astype(m.Float)
    py = (pix // w).astype(m.Float)
    n_total = w * h * spp_per_pass
    sampler = Sampler.create(
        seed, lane=lane + jnp.uint32(n_total) * pass_idx
    )
    sampler, jitter = sampler.next_2d()
    pos = jnp.stack([px, py], axis=-1) + jitter
    ray = sensorlib.sample_ray(scene.camera, pos)
    L, _, _ = integrator.sample(scene, sampler, ray)
    L = jnp.where(jnp.isfinite(L), L, 0.0)
    film = jnp.zeros(film_shape, m.Float)
    return filmlib.put(film, pos, L, rfilter=rfilter)


@partial(
    jax.jit,
    static_argnames=("integrator", "spp_per_pass", "rfilter", "mesh",
                     "n_launch"),
)
def _render_pass_sharded(scene, integrator, seed, pass_idx,
                         spp_per_pass: int, rfilter: str, mesh: Mesh,
                         lane_offset=0, n_launch: int | None = None):
    w, h = scene.camera.resolution
    n = w * h * spp_per_pass
    ndev = mesh.shape["dp"]
    n_pad = n_launch if n_launch is not None else (
        ((n + ndev - 1) // ndev) * ndev
    )
    lanes = jnp.uint32(lane_offset) + jnp.arange(n_pad, dtype=jnp.uint32)
    # lanes beyond n wrap; they re-trace lane 0 but splat weight is divided
    # out by develop, so padding only costs compute, not bias
    lanes = jnp.where(lanes < n, lanes, jnp.uint32(0))

    def per_device(scene, lanes):
        film = _trace_lanes(
            scene, integrator, seed, pass_idx, lanes, spp_per_pass,
            rfilter, (h, w, 4),
        )
        return jax.lax.psum(film, "dp")

    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=P(),
        # the bounce loop mixes replicated (scene) and varying (lane) state;
        # VMA inference can't type the while carry, so it is disabled here
        check_vma=False,
    )
    return shard_fn(scene, lanes)


def render_sharded(scene, integrator, mesh: Mesh, seed: int = 0,
                   spp: int = 16, rfilter: str = "box",
                   spp_per_pass: int | None = None,
                   chunk: int | None = None):
    """Multi-device render: wavefront sharded over mesh axis "dp".

    `chunk` bounds the per-DEVICE lanes per launch: each shard_map launch
    traces chunk*ndev lanes and the host loops over lane offsets.  This is
    the multi-chip composition of the single-chip chunked render (the axon
    remote compiler's latency explodes with per-program lane count, so
    whole-wavefront per-device programs are uncompilable at flagship sizes
    — BENCH.md; same chunk ladder, now per device).
    """
    w, h = scene.camera.resolution
    if spp_per_pass is None:
        spp_per_pass = max(1, min(spp, (1 << 21) // max(w * h, 1)))
    while spp % spp_per_pass:
        spp_per_pass -= 1
    ndev = mesh.shape["dp"]
    n = w * h * spp_per_pass
    film = filmlib.new_film(w, h)
    for p in range(spp // spp_per_pass):
        if chunk is None:
            film = film + _render_pass_sharded(
                scene, integrator, jnp.uint32(seed), jnp.uint32(p),
                spp_per_pass, rfilter, mesh,
            )
        else:
            n_launch = chunk * ndev
            for off in range(0, n, n_launch):
                film = film + _render_pass_sharded(
                    scene, integrator, jnp.uint32(seed), jnp.uint32(p),
                    spp_per_pass, rfilter, mesh,
                    lane_offset=jnp.uint32(off), n_launch=n_launch,
                )
    return filmlib.develop(film)


def render_persistent_sharded(scene, mesh: Mesh, seed: int = 0,
                              spp: int = 16, max_depth: int = 16,
                              rr_depth: int = 4, rfilter: str = "box",
                              n_lanes: int = 32768, steps: int = 16,
                              rounds_per_launch: int = 8):
    """Multi-chip persistent-wavefront render: each device runs its own
    incremental-traversal state machine (integrators/persistent.py) over an
    owned contiguous slice of the global ray stream; each device splats its
    deferred per-ray radiance slice once at the end, films psum at develop.
    RNG is keyed by global ray index, so the result equals the
    single-device renderer up to splat-order float noise."""
    from ..integrators.persistent import (
        PersistentState,
        _run_persistent,
        splat_deferred,
        unify_tables,
    )

    w, h = scene.camera.resolution
    n_total = w * h * spp
    ndev = mesh.shape["dp"]
    per = (n_total + ndev - 1) // ndev
    n_lanes = min(n_lanes, per)

    st = PersistentState.empty(
        n_lanes * ndev,
        stack_depth=None if scene.bvh.layout is None
        else scene.bvh.layout.stack)
    rayLs = jnp.zeros((ndev, per + 1, 3), m.Float)
    offsets = jnp.arange(ndev, dtype=jnp.uint32) * jnp.uint32(per)
    cursors = offsets
    ray_end = jnp.minimum(
        (jnp.arange(ndev, dtype=jnp.uint32) + 1) * jnp.uint32(per),
        jnp.uint32(n_total),
    )

    unified, n_nodes = unify_tables(scene.bvh)

    def per_device(scene, st, rayL, next_ray, rend, off, seed, unified):
        st, rl, nr = _run_persistent(
            scene, st, rayL[0], next_ray[0], seed, rend[0], unified,
            off[0], n_nodes=n_nodes, spp=spp, max_depth=max_depth,
            rr_depth=rr_depth, steps=steps, n_rounds=rounds_per_launch,
        )
        return st, rl[None], nr[None]

    shard_fn = jax.jit(
        jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                      P(), P()),
            out_specs=(P("dp"), P("dp"), P("dp")),
            check_vma=False,
        ),
        donate_argnums=(1, 2, 3),
    )

    seed_u = jnp.uint32(seed)
    while True:
        st, rayLs, cursors = shard_fn(
            scene, st, rayLs, cursors, ray_end, offsets, seed_u, unified
        )
        n_alive = int(jnp.sum(st.alive.astype(jnp.int32)))
        done = bool(jnp.all(cursors >= ray_end))
        if done and n_alive == 0:
            break
    # develop-time (once per frame): stitch the owned slices back into the
    # global per-ray buffer and splat.  Positions re-derive from the RNG,
    # so this equals the single-device splat exactly.
    rayL = rayLs[:, :per].reshape(ndev * per, 3)[:n_total]
    film = splat_deferred(
        scene.camera, seed_u, rayL, jnp.uint32(0), jnp.uint32(n_total),
        spp=spp, rfilter=rfilter, w=w, h=h,
    )
    return filmlib.develop(film)


@partial(jax.jit, static_argnames=("integrator", "spp_per_pass", "mesh"))
def sharded_grad_step(scene, params, target, seed, mesh: Mesh,
                      integrator, spp_per_pass: int = 1):
    """One data-parallel differentiable-render training step.

    Per device: trace a lane shard with AD enabled, build the partial film,
    psum films to get the full estimate, MSE against `target`, backprop;
    parameter grads are identical across devices by construction (the psum
    is inside the loss), giving the all-reduced gradient of BASELINE.md.
    Returns (loss, grads) — both replicated.
    """
    w, h = scene.camera.resolution
    n = w * h * spp_per_pass
    ndev = mesh.shape["dp"]
    n_pad = ((n + ndev - 1) // ndev) * ndev
    lanes = jnp.arange(n_pad, dtype=jnp.uint32)
    lanes = jnp.where(lanes < n, lanes, jnp.uint32(0))

    def per_device(scene, target, lanes, params):
        def loss_fn(params):
            s = scene_update(scene, params)
            film = _trace_lanes(
                s, integrator, seed, jnp.uint32(0), lanes, spp_per_pass,
                "box", (h, w, 4),
            )
            film = jax.lax.psum(film, "dp")
            img = filmlib.develop(film)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # psum's TRANSPOSE is itself an all-reduce, so each device's film
        # cotangent arrives ndev-fold inflated and its grad is ndev x (its
        # own lanes' partial).  psum/ndev = the exact full gradient (this
        # is the actual NCCL-all-reduce analog; round 1's "identical by
        # construction" was wrong — caught by the replay equality test).
        ndev = jax.lax.psum(1, "dp")
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, "dp") / ndev, grads
        )
        return loss, grads

    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P("dp"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return shard_fn(scene, target, lanes, params)


def sharded_replay_grad(scene, params, target, seed, mesh: Mesh, *,
                        idx0: int = 0, n_lanes: int = 32768, spp: int,
                        max_depth: int, rr_depth: int = 4,
                        rfilter: str = "box", steps: int = 16,
                        rounds_per_launch: int = 8, ray_end=None):
    """Multi-chip fwd+bwd on the production path: per device, RECORD a
    contiguous ray range with the persistent state machine (no AD), then
    grad-of-REPLAY with the partial films psum'd inside the loss —
    traversal never enters the AD graph (integrators/replay.py), and the
    parameter grads come out replicated/all-reduced exactly as
    sharded_grad_step's.  Returns (loss, grads)."""
    from ..integrators import replay as rp
    from ..integrators.persistent import (
        PersistentState,
        _refill_persistent,
        unify_tables,
    )

    w, h = scene.camera.resolution
    ndev = mesh.shape["dp"]
    n = n_lanes * ndev
    if ray_end is None:
        ray_end = idx0 + n
    seed_u = jnp.uint32(seed)
    unified, n_nodes = unify_tables(scene.bvh)

    starts = jnp.uint32(idx0) + jnp.arange(ndev, dtype=jnp.uint32) \
        * jnp.uint32(n_lanes)
    ends = jnp.minimum(starts + jnp.uint32(n_lanes), jnp.uint32(ray_end))

    # ---------------------------- record ----------------------------
    def dev_arm(scene, st, start, end, seed):
        st, _ = _refill_persistent(
            scene, st, start[0], seed, spp=spp, ray_end=end[0]
        )
        return st

    arm = jax.jit(jax.shard_map(
        dev_arm, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P("dp"), P()),
        out_specs=P("dp"), check_vma=False,
    ))
    st = arm(scene, PersistentState.empty(
        n, stack_depth=None if scene.bvh.layout is None
        else scene.bvh.layout.stack), starts, ends, seed_u)

    def dev_record(scene, st, rec, sh_depth, seed, unified):
        return rp._run_record(
            scene, st, rec, sh_depth, seed, unified, n_nodes=n_nodes,
            max_depth=max_depth, rr_depth=rr_depth, steps=steps,
            n_rounds=rounds_per_launch,
        )

    rec_fn = jax.jit(
        jax.shard_map(
            dev_record, mesh=mesh,
            in_specs=(P(), P("dp"), P("dp"), P("dp"), P(), P()),
            out_specs=(P("dp"), P("dp"), P("dp")),
            check_vma=False,
        ),
        donate_argnums=(1, 2, 3),
    )
    rec = rp.PathRecord.empty(n, max_depth)
    sh_depth = jnp.ones((n,), jnp.int32)
    while True:
        st, rec, sh_depth = rec_fn(scene, st, rec, sh_depth, seed_u, unified)
        if int(jnp.sum(st.alive.astype(jnp.int32))) == 0:
            break

    # ------------------------- replay + grad -------------------------
    def dev_grad(scene, params, target, rec, start, end):
        def loss_fn(p):
            s = scene_update(scene, p)
            L, pos, act0 = rp.replay_radiance(
                s, rec, seed_u, start[0], spp=spp, max_depth=max_depth,
                rr_depth=rr_depth, ray_end=end[0],
            )
            film = filmlib.new_film(w, h)
            film = filmlib.put(
                film, pos, jnp.where(jnp.isfinite(L), L, 0.0),
                active=act0, rfilter=rfilter,
            )
            film = jax.lax.psum(film, "dp")
            img = filmlib.develop(film)
            msk = (film[..., 3] > 0.0)[..., None]
            return jnp.sum(jnp.where(msk, (img - target) ** 2, 0.0))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # psum-transpose inflation: see sharded_grad_step — psum/ndev is
        # the exact full gradient
        ndev = jax.lax.psum(1, "dp")
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, "dp") / ndev, grads
        )
        return loss, grads

    grad_fn = jax.jit(jax.shard_map(
        dev_grad, mesh=mesh,
        in_specs=(P(), P(), P(), P("dp"), P("dp"), P("dp")),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    return grad_fn(scene, params, target, rec, starts, ends)
