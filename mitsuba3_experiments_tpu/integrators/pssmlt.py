"""Primary-sample-space Metropolis light transport (PSSMLT).

TPU-native re-design of /root/reference/pssmlt.py + pssmltpath.py: one Markov
chain per pixel lane, mutating (a) the screen-space offset (gaussian
small-step / uniform large-step, pssmlt.py:245-255) and (b) the per-bounce
path state — the BSDF direction `wo` (spherical lerp toward a fresh sample,
a=0.01, pssmltpath.py:170-190) and the NEE emitter sample point (gaussian
step).  Acceptance by luminance ratio with cumulative-weight splatting
(pssmlt.py:137-165) and the reference's bootstrap/reset schedule (large step
every 50, aggregate after 40; pssmlt.py:206-219).

Structure: the (max_depth, N) AoS vertex buffer (`Path`, pssmlt.py:27-67)
becomes plain (max_depth, N, ...) arrays in a chain-state pytree; the 200
host-driven kernel rounds become 200 calls of one jitted `step` (state
donated); per-bounce scatter/gather of vertices becomes `.at[depth]`
indexing inside a `fori_loop`.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from ..core.records import BSDFFlags, Ray, SurfaceInteraction, has_flag
from ..core.rng import Sampler
from ..core.struct import jstruct, twhere
from ..intersect import ray_intersect
from ..render import bsdf as bsdflib
from ..render import film as filmlib
from ..render import sensor as sensorlib
from ..render.emitter import (
    eval_emitter,
    pdf_emitter_direction,
    sample_emitter_direction,
)
from .common import mis_weight, register_integrator


@jstruct
class PssmltState:
    """Per-chain (per-pixel-lane) Markov state."""

    offset: jnp.ndarray      # (N, 2) screen-space sample offset in [0,1)
    L: jnp.ndarray           # (N, 3) radiance of current chain state
    cumulative_weight: jnp.ndarray  # (N,)
    path_wo: jnp.ndarray     # (D, N, 3) accepted per-bounce local dirs
    path_em: jnp.ndarray     # (D, N, 2) accepted per-bounce emitter samples


@dataclasses.dataclass(frozen=True)
class Pssmlt:
    """mode="path": full NEE+MIS chain integrator registered as "pssmlt"
    (pssmltpath.py); mode="simple": BSDF-sampling only, mutating just wo with
    a=0.1 — the reference's "pssmlt_simple" (pssmltsimple.py:16-142)."""

    max_depth: int = 8
    rr_depth: int = 4
    mode: str = "path"           # "path" | "simple"
    wo_step: float = 0.01        # pssmltpath.py:176 `a` (simple uses 0.1)
    offset_sigma2: float = 0.1   # pssmlt.py:251 variance of offset step
    em_sigma2: float = 0.01      # pssmltpath.py:183
    reset_interval: int = 50
    bootstrap_count: int = 40

    def __post_init__(self):
        if self.mode == "simple" and self.wo_step == 0.01:
            object.__setattr__(self, "wo_step", 0.1)  # pssmltsimple.py:139

    def init_state(self, n: int) -> PssmltState:
        return PssmltState(
            offset=jnp.full((n, 2), 0.5, m.Float),
            L=jnp.zeros((n, 3), m.Float),
            cumulative_weight=jnp.zeros((n,), m.Float),
            path_wo=jnp.zeros((self.max_depth, n, 3), m.Float),
            path_em=jnp.zeros((self.max_depth, n, 2), m.Float),
        )

    # -- mutations ---------------------------------------------------------
    def mutate_offset(self, old, u2, large_step):
        prop = warp.square_to_std_normal(u2) * jnp.sqrt(self.offset_sigma2) + old
        return jnp.where(
            large_step[:, None], u2, jnp.clip(prop, 0.0, 1.0)
        )

    def mutate_wo(self, old_wo, new_wo, large_step):
        a = self.wo_step
        blended = m.normalize(old_wo * (1.0 - a) + new_wo * a)
        return jnp.where(large_step[:, None], new_wo, blended)

    def mutate_em(self, old_em, u2, large_step):
        prop = jnp.clip(
            warp.square_to_std_normal(u2) * jnp.sqrt(self.em_sigma2) + old_em,
            0.0, 1.0,
        )
        return jnp.where(large_step[:, None], u2, prop)

    # -- chain-conditioned path sample (pssmltpath.py:17-168) --------------
    def sample(self, scene, sampler, ray, state: PssmltState, large_step):
        n = ray.o.shape[0]
        L = jnp.zeros((n, 3), m.Float)
        f = jnp.ones((n, 3), m.Float)
        eta = jnp.ones((n,), m.Float)
        depth = jnp.zeros((n,), jnp.int32)
        active = jnp.ones((n,), bool)
        prev_si = SurfaceInteraction.invalid(n)
        prev_bsdf_pdf = jnp.ones((n,), m.Float)
        prev_bsdf_delta = jnp.ones((n,), bool)
        prop_wo = state.path_wo
        prop_em = state.path_em
        mats, tex = scene.materials, scene.textures

        def body(d, carry):
            (L, f, eta, depth, active, ray, prev_si, prev_bsdf_pdf,
             prev_bsdf_delta, sampler, prop_wo, prop_em) = carry

            si = ray_intersect(scene, ray, active)

            # direct emission with MIS vs previous bounce's NEE
            if self.mode == "path":
                em_pdf = pdf_emitter_direction(
                    scene, prev_si, si, ~prev_bsdf_delta
                )
            else:  # simple: BSDF sampling is the only strategy
                em_pdf = jnp.zeros((n,), m.Float)
            mis_b = mis_weight(prev_bsdf_pdf, em_pdf)
            L = L + jnp.where(
                (active & (prev_bsdf_pdf > 0))[:, None],
                f * eval_emitter(scene, si, active) * mis_b[:, None],
                0.0,
            )

            active_next = active & ((depth + 1) < self.max_depth) & si.valid

            # fresh BSDF sample, then mutate toward it
            sampler, u1 = sampler.next_1d()
            sampler, u2 = sampler.next_2d()
            bs, bsdf_weight = bsdflib.sample(mats, tex, si, u1, u2, active_next)

            old_wo = state.path_wo[d]
            wo_mut = self.mutate_wo(old_wo, bs.wo, large_step)
            ev_val, ev_pdf = bsdflib.eval_pdf(mats, tex, si, wo_mut, active_next)
            use_mut = ev_pdf > 0.0
            wo_final = jnp.where(use_mut[:, None], wo_mut, bs.wo)
            bsdf_weight = jnp.where(
                use_mut[:, None],
                m.safe_div(ev_val, ev_pdf[:, None]),
                bsdf_weight,
            )
            ray = si.spawn_ray(si.to_world(wo_final))

            # NEE with mutated emitter sample (path mode only; the simple
            # variant relies purely on BSDF sampling, pssmltsimple.py)
            if self.mode == "path":
                flags = bsdflib.bsdf_flags(mats, si.mat_id)
                active_em = active_next & has_flag(flags, BSDFFlags.Smooth)
                sampler, u_em = sampler.next_2d()
                em_mut = self.mutate_em(state.path_em[d], u_em, large_step)
                ds, em_weight = sample_emitter_direction(
                    scene, si, em_mut, True, active_em
                )
                wo_l = si.to_local(ds.d)
                nee_val, nee_pdf = bsdflib.eval_pdf(
                    mats, tex, si, wo_l, active_em
                )
                mi_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, nee_pdf))
                L = L + jnp.where(
                    active_em[:, None],
                    f * nee_val * em_weight * mi_em[:, None], 0.0,
                )
            else:
                em_mut = state.path_em[d]

            # record proposal vertex
            prop_wo = prop_wo.at[d].set(wo_final)
            prop_em = prop_em.at[d].set(em_mut)

            f = f * bsdf_weight
            eta = eta * bs.eta
            prev_si = si
            prev_bsdf_pdf = jnp.where(use_mut, ev_pdf, bs.pdf)
            prev_bsdf_delta = has_flag(bs.sampled_type, BSDFFlags.Delta)
            depth = jnp.where(active & si.valid, depth + 1, depth)

            fmax = m.max_component(f)
            rr_prob = jnp.minimum(fmax * eta * eta, 0.95)
            rr_active = depth >= self.rr_depth
            sampler, u_rr = sampler.next_1d()
            f = jnp.where(
                rr_active[:, None], f * m.safe_rcp(rr_prob)[:, None], f
            )
            active = active_next & (~rr_active | (u_rr < rr_prob)) & (fmax != 0.0)
            return (L, f, eta, depth, active, ray, prev_si, prev_bsdf_pdf,
                    prev_bsdf_delta, sampler, prop_wo, prop_em)

        carry = (L, f, eta, depth, active, ray, prev_si, prev_bsdf_pdf,
                 prev_bsdf_delta, sampler, prop_wo, prop_em)
        carry = jax.lax.fori_loop(0, self.max_depth, body, carry)
        (L, f, eta, depth, active, ray, prev_si, prev_bsdf_pdf,
         prev_bsdf_delta, sampler, prop_wo, prop_em) = carry
        return L, prop_wo, prop_em, sampler

    # -- one MCMC round over all chains (pssmlt.py:112-165) ----------------
    @partial(jax.jit, static_argnames=("self",), donate_argnums=(2, 3))
    def step(self, scene, state: PssmltState, film, seed, it,
             large_step, aggregate):
        w, h = scene.camera.resolution
        n = w * h
        pix = jnp.arange(n, dtype=jnp.uint32)
        px = (pix % w).astype(m.Float)
        py = (pix // w).astype(m.Float)
        sampler = Sampler.create(seed + it, lane=pix)

        large = jnp.broadcast_to(large_step, (n,))
        sampler, u_off = sampler.next_2d()
        proposed_offset = self.mutate_offset(state.offset, u_off, large)
        pos = jnp.stack([px, py], axis=-1) + proposed_offset
        ray = sensorlib.sample_ray(scene.camera, pos)

        L_prop, prop_wo, prop_em, sampler = self.sample(
            scene, sampler, ray, state, large
        )
        L_prop = jnp.where(jnp.isfinite(L_prop), L_prop, 0.0)

        a = jnp.clip(
            m.safe_div(m.luminance(L_prop), m.luminance(state.L), fill=1.0),
            0.0, 1.0,
        )
        sampler, u = sampler.next_1d()
        accept = u < a

        cumulative = jnp.where(
            accept, a, state.cumulative_weight + (1.0 - a)
        )
        offset = jnp.where(accept[:, None], proposed_offset, state.offset)
        L = jnp.where(accept[:, None], L_prop, state.L)
        path_wo = jnp.where(accept[None, :, None], prop_wo, state.path_wo)
        path_em = jnp.where(accept[None, :, None], prop_em, state.path_em)

        res = L * m.safe_rcp(cumulative)[:, None]
        film = filmlib.put(
            film, jnp.stack([px + 0.5, py + 0.5], axis=-1), res,
            active=jnp.broadcast_to(aggregate, (n,)), rfilter="box",
        )
        new_state = PssmltState(
            offset=offset, L=L, cumulative_weight=cumulative,
            path_wo=path_wo, path_em=path_em,
        )
        return new_state, film

    # -- full render (pssmlt.py:167-228) -----------------------------------
    def render(self, scene, seed: int = 0, n_iterations: int = 200):
        w, h = scene.camera.resolution
        state = self.init_state(w * h)
        film = filmlib.new_film(w, h)
        for i in range(n_iterations):
            large = (i % self.reset_interval) == 0
            aggregate = (i % self.reset_interval) > self.bootstrap_count
            state, film = self.step(
                scene, state, film, jnp.uint32(seed), jnp.uint32(i),
                jnp.asarray(large), jnp.asarray(aggregate),
            )
        return filmlib.develop(film)


register_integrator("pssmlt", Pssmlt)
