"""Minimal BSDF-sampling-only path tracer — the reference's `simple.py`
integrator (/root/reference/simple.py:14-116): no NEE, no MIS; hit emitters
accumulate directly.  Converges to the same image as the MIS tracer (used as
a consistency oracle in tests)."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import math as m
from ..intersect import ray_intersect
from ..render import bsdf as bsdflib
from ..render.emitter import eval_emitter
from .common import register_integrator


@dataclasses.dataclass(frozen=True)
class SimpleIntegrator:
    max_depth: int = 16
    rr_depth: int = 4

    def sample(self, scene, sampler, ray, active=None):
        n = ray.o.shape[0]
        if active is None:
            active = jnp.ones((n,), bool)

        L = jnp.zeros((n, 3), m.Float)
        f = jnp.ones((n, 3), m.Float)
        depth = jnp.zeros((n,), jnp.int32)
        si = ray_intersect(scene, ray, active)
        L = L + eval_emitter(scene, si, active)
        active = active & si.valid

        state = (L, f, depth, active, si, sampler)

        def body(state):
            L, f, depth, active, si, sampler = state
            sampler, u1 = sampler.next_1d()
            sampler, u2 = sampler.next_2d()
            bs, weight = bsdflib.sample(
                scene.materials, scene.textures, si, u1, u2, active
            )
            f = f * weight

            # Russian roulette (simple.py:55-63 style)
            fmax = m.max_component(f)
            rr_prob = jnp.minimum(fmax, 0.95)
            rr_active = depth >= self.rr_depth
            sampler, u_rr = sampler.next_1d()
            f = jnp.where(
                rr_active[:, None],
                f * m.safe_rcp(jax.lax.stop_gradient(rr_prob))[:, None],
                f,
            )
            active &= (fmax > 0.0) & (~rr_active | (u_rr < rr_prob))

            ray2 = si.spawn_ray(si.to_world(bs.wo))
            si2 = ray_intersect(scene, ray2, active)
            L = L + jnp.where(
                active[:, None], f * eval_emitter(scene, si2, active), 0.0
            )
            si = si2
            depth = jnp.where(active, depth + 1, depth)
            active &= (depth < self.max_depth - 1) & si.valid
            return (L, f, depth, active, si, sampler)

        state = jax.lax.while_loop(lambda s: jnp.any(s[3]), body, state)
        L, f, depth, active, si, sampler = state
        return L, jnp.ones((n,), bool), sampler


register_integrator("simple", SimpleIntegrator)
