"""Area emitters: evaluation, next-event estimation sampling, MIS pdfs.

Replaces scene.sample_emitter_direction / pdf_emitter_direction / emitter
eval (used by every integrator: /root/reference/path.py:247-292,
path-mis.py:96-117).  Emissive geometry is flattened to a global set of
emissive faces with a power-weighted discrete distribution (scene/types.py
EmitterTable); direction sampling = face pick + uniform triangle point,
converted to solid-angle density.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from ..core.records import DirectionSample, Ray
from ..scene.types import Scene


def eval_emitter(scene: Scene, si, active=None):
    """Radiance of the emitter at si towards the viewer (si.wi.z > 0 side).

    Mirrors `si.emitter(scene).eval(si)` — area lights emit from their front
    (geometric normal) side only.
    """
    has_em = si.emitter_id >= 0
    if active is not None:
        has_em = has_em & active
    front = si.wi[..., 2] > 0.0
    rad = jnp.take(
        scene.emitters.radiance, jnp.maximum(si.emitter_id, 0), axis=0
    )
    return jnp.where((has_em & front)[:, None], rad, 0.0)


def eval_environment(scene: Scene, active):
    """Constant environment radiance for escaped rays (mi `constant`
    emitter; scene.environment() gate at /root/reference/path-mis.py:41)."""
    env = scene.emitters.env_radiance
    return jnp.where(active[:, None], env[None, :], 0.0)


def sample_emitter_direction(scene: Scene, si_ref, u2, test_visibility=True,
                             active=None):
    """NEE: sample a direction towards an emitter from si_ref.

    Returns (DirectionSample, weight = Le * visibility / pdf)."""
    from ..intersect import ray_test

    em = scene.emitters
    n = si_ref.p.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)

    # pick emissive face (power-weighted) and reuse the uniform
    slot, u_re = em.face_dist.sample_reuse(u2[..., 0])
    face = jnp.take(em.em_face, slot)
    fidx = jnp.take(scene.geometry.faces, face, axis=0)
    v0 = jnp.take(scene.geometry.vertices, fidx[:, 0], axis=0)
    v1 = jnp.take(scene.geometry.vertices, fidx[:, 1], axis=0)
    v2 = jnp.take(scene.geometry.vertices, fidx[:, 2], axis=0)

    b = warp.square_to_uniform_triangle(
        jnp.stack([u_re, u2[..., 1]], axis=-1)
    )
    p = v0 + (v1 - v0) * b[..., 0:1] + (v2 - v0) * b[..., 1:2]
    ng = m.normalize(m.cross(v1 - v0, v2 - v0))

    d_un = p - si_ref.p
    dist2 = m.squared_norm(d_un)
    dist = jnp.sqrt(dist2)
    d = d_un * m.safe_rcp(dist)[..., None]

    cos_l = m.dot(ng, -d)          # emitter front side faces the receiver
    area = jnp.take(em.em_face_area, slot)
    pmf = em.face_dist.prob(slot)
    pdf_sa = m.safe_div(pmf * dist2, cos_l * area)
    valid = active & (cos_l > 0.0) & (dist2 > 0.0) & (pdf_sa > 0.0)

    rad = jnp.take(em.radiance, jnp.take(em.em_face_emitter, slot), axis=0)
    weight = jnp.where(
        valid[:, None], rad * m.safe_rcp(pdf_sa)[:, None], 0.0
    )

    if test_visibility:
        shadow_ray = si_ref.spawn_ray_to(p)
        occluded = ray_test(scene, shadow_ray, valid)
        valid &= ~occluded
        weight = jnp.where(valid[:, None], weight, 0.0)

    ds = DirectionSample(
        p=p,
        n=ng,
        d=d,
        dist=dist,
        pdf=jnp.where(valid, pdf_sa, 0.0),
        delta=jnp.zeros((n,), bool),
        emitter_id=jnp.where(
            valid, jnp.take(em.em_face_emitter, slot), -1
        ),
    )
    return ds, weight


def sample_emitter_ray(scene: Scene, u_pos2, u_dir2, active=None):
    """Sample a ray leaving an emitter (scene.sample_emitter_ray,
    /root/reference/bdpt02.py:86-88): power-weighted face pick, uniform
    position, cosine-weighted direction about the face normal.

    Returns (ray, weight, emitter_id) with
    weight = Le * pi / p_area  (the cosine direction pdf cancels cos theta).
    """
    em = scene.emitters
    slot, u_re = em.face_dist.sample_reuse(u_pos2[..., 0])
    face = jnp.take(em.em_face, slot)
    fidx = jnp.take(scene.geometry.faces, face, axis=0)
    v0 = jnp.take(scene.geometry.vertices, fidx[:, 0], axis=0)
    v1 = jnp.take(scene.geometry.vertices, fidx[:, 1], axis=0)
    v2 = jnp.take(scene.geometry.vertices, fidx[:, 2], axis=0)
    b = warp.square_to_uniform_triangle(
        jnp.stack([u_re, u_pos2[..., 1]], axis=-1)
    )
    p = v0 + (v1 - v0) * b[..., 0:1] + (v2 - v0) * b[..., 1:2]
    ng = m.normalize(m.cross(v1 - v0, v2 - v0))

    d_local = warp.square_to_cosine_hemisphere(u_dir2)
    s, t = m.coordinate_system(ng)
    d = m.to_world(s, t, ng, d_local)

    area = jnp.take(em.em_face_area, slot)
    pmf = em.face_dist.prob(slot)
    p_area = m.safe_div(pmf, area)
    rad = jnp.take(em.radiance, jnp.take(em.em_face_emitter, slot), axis=0)
    weight = rad * (m.PI * m.safe_rcp(p_area))[:, None]

    o = p + ng * m.RAY_EPS
    ray = Ray.make(o, d)
    return ray, weight, jnp.take(em.em_face_emitter, slot)


def pdf_emitter_direction(scene: Scene, si_ref, si_hit, active=None):
    """Solid-angle pdf that NEE from si_ref would have sampled the emissive
    face hit at si_hit (for MIS of BSDF-sampled rays, path.py:288)."""
    em = scene.emitters
    slot = jnp.take(em.face_to_slot, jnp.maximum(si_hit.prim_idx, 0))
    has = (si_hit.prim_idx >= 0) & (slot >= 0)
    if active is not None:
        has = has & active
    slot_s = jnp.maximum(slot, 0)

    d_un = si_hit.p - si_ref.p
    dist2 = m.squared_norm(d_un)
    d = d_un * m.jax_rsqrt_safe(dist2)[..., None]
    cos_l = m.dot(si_hit.n, -d)
    area = jnp.take(em.em_face_area, slot_s)
    pmf = em.face_dist.prob(slot_s)
    pdf = m.safe_div(pmf * dist2, cos_l * area)
    return jnp.where(has & (cos_l > 0.0), pdf, 0.0)
