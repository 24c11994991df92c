"""Vectorized interaction records — pytree analogs of Mitsuba's typed records
(mi.Ray3f, mi.SurfaceInteraction3f, mi.DirectionSample3f, mi.BSDFSample3f,
used throughout the reference, e.g. /root/reference/path.py:238-292).

Every field is an array with leading wavefront shape (N,); vectors (N, 3).
Records are plain registered dataclasses (core.struct.jstruct) so whole-record
gather/scatter/select are tree ops.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m
from .struct import jstruct, replace  # noqa: F401 (replace re-exported)


# BSDF lobe flags — same lattice as mi.BSDFFlags (bit values chosen fresh).
class BSDFFlags:
    Empty = 0
    DiffuseReflection = 1 << 0
    DiffuseTransmission = 1 << 1
    GlossyReflection = 1 << 2
    GlossyTransmission = 1 << 3
    DeltaReflection = 1 << 4
    DeltaTransmission = 1 << 5
    Null = 1 << 6
    BackSide = 1 << 7
    FrontSide = 1 << 8

    Diffuse = DiffuseReflection | DiffuseTransmission
    Glossy = GlossyReflection | GlossyTransmission
    Smooth = Diffuse | Glossy
    Delta = DeltaReflection | DeltaTransmission
    Reflection = DiffuseReflection | GlossyReflection | DeltaReflection
    Transmission = DiffuseTransmission | GlossyTransmission | DeltaTransmission
    All = Smooth | Delta | Null


def has_flag(flags, bit):
    return (flags & bit) != 0


@jstruct
class Ray:
    """o + t*d for t in (0, maxt)."""

    o: jnp.ndarray       # (N, 3)
    d: jnp.ndarray       # (N, 3), unit
    maxt: jnp.ndarray    # (N,)

    @staticmethod
    def make(o, d, maxt=None):
        if maxt is None:
            maxt = jnp.full(o.shape[:-1], jnp.inf, m.Float)
        return Ray(o=o, d=d, maxt=maxt)


@jstruct
class SurfaceInteraction:
    """Hit record. Invalid lanes have t = inf and prim_idx = -1.

    wi is the incident direction in the *shading* frame (si.wi convention);
    sh_* spans the shading frame; n is the geometric normal.
    """

    t: jnp.ndarray        # (N,)
    p: jnp.ndarray        # (N, 3)
    n: jnp.ndarray        # (N, 3) geometric normal
    sh_n: jnp.ndarray     # (N, 3) shading normal
    sh_s: jnp.ndarray     # (N, 3) shading tangent
    sh_t: jnp.ndarray     # (N, 3) shading bitangent
    uv: jnp.ndarray       # (N, 2)
    wi: jnp.ndarray       # (N, 3) local incident dir (towards camera)
    prim_idx: jnp.ndarray    # (N,) int32 triangle index, -1 invalid
    mat_id: jnp.ndarray      # (N,) int32 material table row, -1 invalid
    emitter_id: jnp.ndarray  # (N,) int32 emitter table row, -1 none

    @property
    def valid(self):
        return jnp.isfinite(self.t)

    def to_local(self, v_world):
        return m.to_local(self.sh_s, self.sh_t, self.sh_n, v_world)

    def to_world(self, v_local):
        return m.to_world(self.sh_s, self.sh_t, self.sh_n, v_local)

    @property
    def wi_world(self):
        return self.to_world(self.wi)

    def spawn_ray(self, d_world):
        """Offset origin along the geometric normal to dodge self-intersection
        (si.spawn_ray, /root/reference/path.py:280)."""
        sign = m.sign_not_zero(m.dot(self.n, d_world))
        o = self.p + self.n * (sign * m.RAY_EPS)[..., None]
        return Ray.make(o, d_world)

    def spawn_ray_to(self, p_target):
        d = p_target - self.p
        dist = m.norm(d)
        d = d * m.safe_rcp(dist)[..., None]
        sign = m.sign_not_zero(m.dot(self.n, d))
        o = self.p + self.n * (sign * m.RAY_EPS)[..., None]
        maxt = dist * (1.0 - 1e-3) - m.RAY_EPS
        return Ray(o=o, d=d, maxt=maxt)

    @staticmethod
    def invalid(n: int):
        z3 = jnp.zeros((n, 3), m.Float)
        return SurfaceInteraction(
            t=jnp.full((n,), jnp.inf, m.Float),
            p=z3,
            n=z3.at[..., 2].set(1.0),
            sh_n=z3.at[..., 2].set(1.0),
            sh_s=z3.at[..., 0].set(1.0),
            sh_t=z3.at[..., 1].set(1.0),
            uv=jnp.zeros((n, 2), m.Float),
            wi=z3.at[..., 2].set(1.0),
            prim_idx=jnp.full((n,), -1, jnp.int32),
            mat_id=jnp.full((n,), -1, jnp.int32),
            emitter_id=jnp.full((n,), -1, jnp.int32),
        )


@jstruct
class DirectionSample:
    """Emitter direction sample (mi.DirectionSample3f): position p/n on the
    emitter, direction d from the reference point, solid-angle pdf."""

    p: jnp.ndarray         # (N, 3)
    n: jnp.ndarray         # (N, 3)
    d: jnp.ndarray         # (N, 3) unit, ref -> emitter
    dist: jnp.ndarray      # (N,)
    pdf: jnp.ndarray       # (N,) solid-angle density (incl. emitter pick prob)
    delta: jnp.ndarray     # (N,) bool
    emitter_id: jnp.ndarray  # (N,) int32


@jstruct
class BSDFSample:
    """mi.BSDFSample3f analog: wo in local frame, pdf, relative IOR eta,
    sampled lobe flags."""

    wo: jnp.ndarray            # (N, 3) local
    pdf: jnp.ndarray           # (N,)
    eta: jnp.ndarray           # (N,)
    sampled_type: jnp.ndarray  # (N,) int32 BSDFFlags of the sampled lobe


@jstruct
class PositionSample:
    p: jnp.ndarray    # (N, 3)
    n: jnp.ndarray    # (N, 3)
    uv: jnp.ndarray   # (N, 2)
    pdf: jnp.ndarray  # (N,) area density
    prim_idx: jnp.ndarray  # (N,) int32
