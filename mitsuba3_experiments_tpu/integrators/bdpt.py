"""Bidirectional path tracing: camera + light subpaths with vertex connection.

TPU-native re-design of /root/reference/bdpt02.py: the (depth, lane) AoS
vertex buffers (`Path[Vertex]`, bdpt02.py:39-71) fall out naturally as
`lax.scan` outputs of shape (max_depth+1, N, ...).

Two tiers:

* `BDPTIntegrator` (default, `mis=True`) — a *complete* bidirectional
  integrator going past the reference's stall point (bdpt02.py:254-274
  connects only its (1,1) pair with no weights): both subpaths record
  forward/reverse area pdfs during the walk, every (s, t) strategy with
  t >= 2 (camera + at least one surface vertex) is connected with a
  visibility ray, and strategies are combined with the Veach power
  heuristic computed from the recorded pdfs (the PBRT-style iterative
  ratio walk with per-strategy endpoint-pdf overrides).  Light-tracing
  strategies (t < 2, film splats) are excluded from the estimator AND
  from every weight denominator, so the restricted mixture still sums to
  one — unbiased.  Environment emitters are reachable only through the
  s=0 family and carry weight 1.  MIS delta bookkeeping treats a vertex
  as delta when its material has no smooth lobe (per-sample delta lobes
  of mixed materials make the weights approximate, never biased).

* `mis=False` — the reference's exact semantics (s=1,t=1 unweighted
  combination with its re-intersection connection), kept for A/B.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.records import BSDFFlags, Ray, SurfaceInteraction, has_flag
from ..core.struct import jstruct, tgather
from ..intersect import ray_intersect, ray_test
from ..render import bsdf as bsdflib
from ..render.emitter import eval_emitter, sample_emitter_ray
from .common import register_integrator


@jstruct
class Vertex:
    """bdpt02.py:23-36 — per-bounce path vertex (leading axis = depth)."""

    p: jnp.ndarray    # (..., N, 3)
    f: jnp.ndarray    # (..., N, 3) cumulative throughput
    L: jnp.ndarray    # (..., N, 3) cumulative radiance
    wi: jnp.ndarray   # (..., N, 3) world-space incident dir at the vertex
    mat_id: jnp.ndarray  # (..., N) material at vertex (for re-eval)
    valid: jnp.ndarray   # (..., N)


def record_path(scene, sampler, ray, max_depth: int = 8):
    """Trace and record per-bounce vertices into a (depth, lane) buffer —
    the public analog of the reference's Path recording utilities
    (pathrecord.py:17-59, path-record.py:55-103): `path[depth]` is
    `tree_map(lambda x: x[depth], path)`; whole-buffer select/scatter are
    tree ops (core.struct)."""
    integ = BDPTIntegrator(max_depth=max_depth)
    path, sampler = integ.record_camera_path(scene, sampler, ray)
    return path, sampler


@jstruct
class FullVertex:
    """Per-vertex record with the pdf bookkeeping MIS needs (leading axis =
    depth for subpath buffers; index 0 = first surface vertex)."""

    p: jnp.ndarray         # (..., N, 3)
    ng: jnp.ndarray        # (..., N, 3) geometric normal
    sh_s: jnp.ndarray      # (..., N, 3) shading frame
    sh_t: jnp.ndarray
    sh_n: jnp.ndarray
    uv: jnp.ndarray        # (..., N, 2)
    wi_world: jnp.ndarray  # (..., N, 3) unit dir from vertex TOWARD prev
    mat_id: jnp.ndarray    # (..., N)
    emitter_id: jnp.ndarray
    prim_idx: jnp.ndarray
    smooth: jnp.ndarray    # (..., N) bool: material has a smooth lobe
    beta: jnp.ndarray      # (..., N, 3) throughput into the vertex
    pdf_fwd: jnp.ndarray   # (..., N) area pdf of generating it from prev
    pdf_rev: jnp.ndarray   # (..., N) area pdf of generating it from next
    valid: jnp.ndarray     # (..., N) bool


def _remap0(x):
    """PBRT's remap0: treat never-sampled (0) pdfs as 1 in MIS ratios."""
    return jnp.where(x == 0.0, 1.0, x)


def _to_area(pdf_sw, p_from, p_to, ng_to):
    """Solid-angle pdf at p_from -> area pdf at p_to."""
    d = p_to - p_from
    dist2 = m.squared_norm(d)
    dn = d * m.jax_rsqrt_safe(dist2)[..., None]
    return pdf_sw * m.safe_div(jnp.abs(m.dot(ng_to, dn)), dist2)


def _vert_si(v: FullVertex, wi_world) -> SurfaceInteraction:
    """Reconstruct a SurfaceInteraction at a recorded vertex with an
    arbitrary incident direction (for swapped-argument pdf evals)."""
    n = v.p.shape[0]
    return SurfaceInteraction(
        t=jnp.ones((n,), m.Float),
        p=v.p, n=v.ng, sh_n=v.sh_n, sh_s=v.sh_s, sh_t=v.sh_t,
        uv=v.uv,
        wi=m.to_local(v.sh_s, v.sh_t, v.sh_n, wi_world),
        prim_idx=v.prim_idx, mat_id=v.mat_id, emitter_id=v.emitter_id,
    )


@dataclasses.dataclass(frozen=True)
class BDPTIntegrator:
    max_depth: int = 16
    rr_depth: int = 4
    mis: bool = True   # False = reference bdpt02.py semantics (s=1,t=1)

    # ------------------------------------------------------------------
    def _record_subpath(self, scene, sampler, ray, weight0, from_light):
        """Shared walk for both subpaths; returns Vertex with leading axis
        depth 0..max_depth (scan over bounces)."""
        n = ray.o.shape[0]
        v0 = Vertex(
            p=ray.o,
            f=jnp.ones((n, 3), m.Float),
            L=(weight0 if from_light else jnp.ones((n, 3), m.Float)),
            wi=jnp.zeros((n, 3), m.Float),
            mat_id=jnp.full((n,), -1, jnp.int32),
            valid=jnp.ones((n,), bool),
        )

        f = jnp.ones((n, 3), m.Float)
        L = weight0 if from_light else jnp.zeros((n, 3), m.Float)
        active = jnp.ones((n,), bool)

        def body(carry, _):
            sampler, ray, f, L, active = carry
            si = ray_intersect(scene, ray, active)
            Le = eval_emitter(scene, si, active)

            active_next = active & si.valid
            sampler, u1 = sampler.next_1d()
            sampler, u2 = sampler.next_2d()
            bs, bsdf_w = bsdflib.sample(
                scene.materials, scene.textures, si, u1, u2, active_next
            )
            ray2 = si.spawn_ray(si.to_world(bs.wo))

            if from_light:
                # bdpt02.py:130-131: f *= w; L = f * L + Le  (importance chain)
                f2 = f * bsdf_w
                L2 = f2 * L + Le
            else:
                # bdpt02.py:195-200: L += f * Le; f *= w
                L2 = L + f * Le
                f2 = f * bsdf_w

            vert = Vertex(
                p=si.p,
                f=f2,
                L=L2,
                wi=si.wi_world,
                mat_id=si.mat_id,
                valid=active & si.valid,
            )
            return (sampler, ray2, f2, L2, active_next), vert

        (sampler, _, _, _, _), verts = jax.lax.scan(
            body, (sampler, ray, f, L, active), None, length=self.max_depth
        )
        path = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), v0, verts
        )
        return path, sampler

    def record_camera_path(self, scene, sampler, ray):
        n = ray.o.shape[0]
        return self._record_subpath(
            scene, sampler, ray, jnp.ones((n, 3), m.Float), from_light=False
        )

    def record_light_path(self, scene, sampler, n):
        sampler, u_pos = sampler.next_2d()
        sampler, u_dir = sampler.next_2d()
        ray, weight, _ = sample_emitter_ray(scene, u_pos, u_dir)
        return self._record_subpath(scene, sampler, ray, weight, from_light=True)

    # ------------------------------------------------------------------
    def connect_s2t(self, scene, s_vert, t_vert):
        """bdpt02.py:213-252: visibility ray from t to s, then re-evaluate the
        BSDF at s for the continuation direction s_vert.wi."""
        s_p = s_vert.p
        t_p = t_vert.p
        d = s_p - t_p
        dist = m.norm(d)
        dirn = d * m.safe_rcp(dist)[:, None]

        conn_active = s_vert.valid & t_vert.valid & (dist > 1e-4)
        shadow = Ray(
            o=t_p + dirn * m.RAY_EPS,
            d=dirn,
            maxt=dist * (1.0 - 1e-3),
        )
        # NOTE the reference (bdpt02.py:238) keeps lanes whose visibility ray
        # *does* hit — it re-intersects to land exactly on s; we mirror that.
        # The acceptance tolerance is RELATIVE to the connection distance
        # (ADVICE r1: the reference's absolute 1e-2 silently breaks on
        # large/small scene scales)
        si = ray_intersect(scene, shadow, conn_active)
        hit_s = si.valid & (
            m.norm(si.p - s_p) < 1e-2 * jnp.maximum(dist, 1e-3)
        )
        active = conn_active & hit_s

        wo = si.to_local(s_vert.wi)
        f_val, pdf = bsdflib.eval_pdf(
            scene.materials, scene.textures, si, wo, active
        )
        weight = m.safe_div(f_val, pdf[:, None])
        weight = jnp.where(active[:, None], weight, 0.0)
        Le = eval_emitter(scene, si, active)
        return weight, Le

    def connect_bdpt(self, scene, s, t, camera_path, light_path):
        """bdpt02.py:254-274 (s=1, t=1 combination)."""
        cs = tgather(camera_path, jnp.asarray(s), axis=0)
        lt = tgather(light_path, jnp.asarray(t), axis=0)
        camera_weight, camera_Le = self.connect_s2t(scene, cs, lt)
        light_weight, light_Le = self.connect_s2t(scene, lt, cs)
        if s == 0:
            camera_weight = jnp.ones_like(camera_weight)
        L = (
            cs.L
            + cs.f * camera_weight * light_Le
            + cs.f * camera_weight * light_weight * lt.L
        )
        return L

    # ==================================================================
    # Full multi-strategy BDPT (mis=True)
    # ==================================================================
    def _record_full(self, scene, sampler, ray, beta0, pending_pdf_sw,
                     prev_p, prev_ng, n_steps: int, active0):
        """Walk a subpath recording FullVertex with fwd/rev area pdfs.

        Emits (vertex_i, pdf_rev_of_vertex_{i-1}) per step; the caller
        aligns pdf_rev by shifting one step."""
        mats, tex = scene.materials, scene.textures
        n = ray.o.shape[0]

        def body(carry, _):
            (sampler, ray, beta, pending_pdf_sw, prev_p, prev_ng,
             active) = carry
            si = ray_intersect(scene, ray, active)
            valid = active & si.valid
            pdf_fwd = _to_area(pending_pdf_sw, prev_p, si.p, si.n)

            flags = bsdflib.bsdf_flags(mats, si.mat_id)
            smooth = has_flag(flags, BSDFFlags.Smooth)

            sampler, u1 = sampler.next_1d()
            sampler, u2 = sampler.next_2d()
            bs, bsdf_w = bsdflib.sample(mats, tex, si, u1, u2, valid)
            wo_world = si.to_world(bs.wo)

            # reverse pdf of the PREVIOUS vertex: swap incident/outgoing at
            # this vertex (pdf of scattering back toward prev, given the
            # new continuation as the incident side)
            vert = FullVertex(
                p=si.p, ng=si.n, sh_s=si.sh_s, sh_t=si.sh_t, sh_n=si.sh_n,
                uv=si.uv, wi_world=si.wi_world, mat_id=si.mat_id,
                emitter_id=si.emitter_id, prim_idx=si.prim_idx,
                smooth=smooth, beta=beta, pdf_fwd=pdf_fwd,
                pdf_rev=jnp.zeros((n,), m.Float), valid=valid,
            )
            # reverse pdf of the PREVIOUS vertex: pdf of scattering back
            # toward it given the new continuation as the incident side
            si_swap = _vert_si(vert, wo_world)
            _, rev_sw = bsdflib.eval_pdf(mats, tex, si_swap, si.wi, valid)
            pdf_rev_prev = _to_area(rev_sw, si.p, prev_p, prev_ng)

            beta2 = beta * bsdf_w
            ray2 = si.spawn_ray(wo_world)
            active2 = valid & (m.max_component(beta2) > 0.0) & (bs.pdf > 0.0)
            carry2 = (sampler, ray2, beta2, bs.pdf, si.p, si.n, active2)
            return carry2, (vert, pdf_rev_prev, ray.d)

        carry0 = (sampler, ray, beta0, pending_pdf_sw, prev_p, prev_ng,
                  active0)
        (sampler, *_), (verts, rev_shift, d_in) = jax.lax.scan(
            body, carry0, None, length=n_steps
        )
        # rev_shift[k] = pdf_rev of vertex k-1 -> vertex i gets rev_shift[i+1]
        pdf_rev = jnp.concatenate(
            [rev_shift[1:], jnp.zeros((1, n), m.Float)], axis=0
        )
        verts = dataclasses.replace(verts, pdf_rev=pdf_rev)
        # rev_shift[0] = pdf_rev of the walk's ORIGIN vertex (y0 for light
        # subpaths); d_in[i] = direction of the ray that generated vertex i
        return verts, rev_shift[0], d_in, sampler

    def _light_origin(self, scene, sampler, n):
        """Sample y0 on an area emitter; returns (FullVertex y0, dir-pdf
        carrier for the walk, sampler)."""
        from ..core import warp
        from ..render.emitter import _scene_radius  # noqa: F401

        em = scene.emitters
        sampler, u_pos = sampler.next_2d()
        sampler, u_dir = sampler.next_2d()

        slot, u_re = em.face_dist.sample_reuse(u_pos[..., 0])
        face = jnp.take(em.em_face, slot)
        fidx = jnp.take(scene.geometry.faces, face, axis=0)
        v0 = jnp.take(scene.geometry.vertices, fidx[:, 0], axis=0)
        v1 = jnp.take(scene.geometry.vertices, fidx[:, 1], axis=0)
        v2 = jnp.take(scene.geometry.vertices, fidx[:, 2], axis=0)
        b = warp.square_to_uniform_triangle(
            jnp.stack([u_re, u_pos[..., 1]], axis=-1)
        )
        p = v0 + (v1 - v0) * b[..., 0:1] + (v2 - v0) * b[..., 1:2]
        ng = m.normalize(m.cross(v1 - v0, v2 - v0))

        area = jnp.take(em.em_face_area, slot)
        pmf = em.face_dist.prob(slot)
        p_area = m.safe_div(pmf, area)
        em_id = jnp.take(em.em_face_emitter, slot)
        rad = jnp.take(em.radiance, em_id, axis=0)

        d_local = warp.square_to_cosine_hemisphere(u_dir)
        s_f, t_f = m.coordinate_system(ng)
        d = m.to_world(s_f, t_f, ng, d_local)
        cos0 = jnp.maximum(m.dot(ng, d), 0.0)
        pdf_dir_sw = cos0 * m.INV_PI

        beta_y0 = rad * m.safe_rcp(p_area)[:, None]
        y0 = FullVertex(
            p=p, ng=ng, sh_s=s_f, sh_t=t_f, sh_n=ng,
            uv=jnp.zeros((n, 2), m.Float),
            wi_world=ng,          # no predecessor; placeholder
            mat_id=jnp.full((n,), -1, jnp.int32),
            emitter_id=em_id,
            prim_idx=face.astype(jnp.int32),
            # connectible-for-MIS: an area-light origin vertex is never
            # delta (PBRT's IsConnectible for light vertices)
            smooth=jnp.ones((n,), bool),
            beta=beta_y0,
            pdf_fwd=p_area,
            pdf_rev=jnp.zeros((n,), m.Float),
            valid=(p_area > 0.0) & (cos0 > 0.0),
        )
        ray = Ray.make(p + ng * m.RAY_EPS, d)
        return y0, ray, pdf_dir_sw, sampler

    def _emission_pdf_area(self, scene, v_at: FullVertex, p_to, ng_to):
        """Area pdf of the emitter at vertex v_at emitting toward p_to."""
        d = p_to - v_at.p
        dist2 = m.squared_norm(d)
        dn = d * m.jax_rsqrt_safe(dist2)[..., None]
        cos0 = jnp.maximum(m.dot(v_at.ng, dn), 0.0)
        pdf_sw = cos0 * m.INV_PI
        return pdf_sw * m.safe_div(jnp.abs(m.dot(ng_to, dn)), dist2)

    def _pos_pdf_area(self, scene, v: FullVertex):
        """Area pdf of sampling the emissive face at vertex v as y0."""
        em = scene.emitters
        slot = jnp.take(em.face_to_slot, jnp.maximum(v.prim_idx, 0))
        ok = (v.prim_idx >= 0) & (slot >= 0)
        slot_s = jnp.maximum(slot, 0)
        p_area = m.safe_div(
            em.face_dist.prob(slot_s), jnp.take(em.em_face_area, slot_s)
        )
        return jnp.where(ok, p_area, 0.0)

    def _scatter_pdf_area(self, scene, v: FullVertex, wi_world, wo_world,
                          p_to, ng_to, active):
        """pdf of scattering at v (incident wi_world) toward wo_world,
        converted to area at p_to."""
        si = _vert_si(v, wi_world)
        wo_local = m.to_local(v.sh_s, v.sh_t, v.sh_n, wo_world)
        _, pdf_sw = bsdflib.eval_pdf(
            scene.materials, scene.textures, si, wo_local, active
        )
        return _to_area(pdf_sw, v.p, p_to, ng_to)

    def _eval_at(self, scene, v: FullVertex, wi_world, wo_world, active):
        """BSDF value (incl. |cos|) at v for incident wi_world, outgoing
        wo_world (both world, unit)."""
        si = _vert_si(v, wi_world)
        wo_local = m.to_local(v.sh_s, v.sh_t, v.sh_n, wo_world)
        f, _ = bsdflib.eval_pdf(
            scene.materials, scene.textures, si, wo_local, active
        )
        return f

    @staticmethod
    def _vtx(path: FullVertex, i: int) -> FullVertex:
        return jax.tree_util.tree_map(lambda a: a[i], path)

    def sample(self, scene, sampler, ray, active=None):
        if not self.mis:
            return self._sample_reference(scene, sampler, ray, active)
        n = ray.o.shape[0]
        if active is None:
            active = jnp.ones((n,), bool)
        D = self.max_depth          # max surface vertices on the full path
        mats, tex = scene.materials, scene.textures

        # ---- camera subpath: z[0] = first surface vertex (z0=camera
        # implicit; camera-edge pdfs cancel across our t>=2 strategies) ----
        zc, _, z_din, sampler = self._record_full(
            scene, sampler, ray,
            jnp.ones((n, 3), m.Float), jnp.ones((n,), m.Float),
            ray.o, ray.d, D, active,
        )
        # ---- environment: only the s=0 family reaches it -> weight 1 ----
        from ..render.emitter import eval_environment

        L = jnp.zeros((n, 3), m.Float)
        esc_prev_act = active
        for i in range(D):
            vi = self._vtx(zc, i)
            esc = esc_prev_act & ~vi.valid   # the ray into vertex i escaped
            L = L + jnp.where(
                esc[:, None],
                vi.beta * eval_environment(scene, esc, z_din[i]), 0.0,
            )
            esc_prev_act = esc_prev_act & vi.valid

        # ---- light subpath ----
        y0, lray, pdf_dir_sw, sampler = self._light_origin(scene, sampler, n)
        yv, y0_rev, _, sampler = self._record_full(
            scene, sampler, lray,
            y0.beta * m.PI, pdf_dir_sw,
            y0.p, y0.ng, max(D - 1, 0), y0.valid,
        )
        y0 = dataclasses.replace(y0, pdf_rev=y0_rev)

        zs = [self._vtx(zc, i) for i in range(D)]
        ys = [y0] + [self._vtx(yv, i) for i in range(max(D - 1, 0))]

        def mis_weight_st(s, t, rev_z, rev_y, delta_z, delta_y):
            """Power-heuristic weight for strategy (s,t) over the t'>=2
            restricted set.  rev_*/delta_* are dicts of per-index override
            arrays layered over the recorded path pdfs."""
            def pz(i, which):
                v = zs[i - 1]   # z index 1.. maps to zs[0..]
                if which == "rev" and i in rev_z:
                    return rev_z[i]
                return v.pdf_rev if which == "rev" else v.pdf_fwd

            def py(i, which):
                v = ys[i]
                if which == "rev" and i in rev_y:
                    return rev_y[i]
                return v.pdf_rev if which == "rev" else v.pdf_fwd

            def dz(i):
                return delta_z.get(i, ~zs[i - 1].smooth)

            def dy(i):
                if i < 0:
                    return jnp.zeros((n,), bool)
                return delta_y.get(i, ~ys[i].smooth)

            sum_ri = jnp.zeros((n,), m.Float)
            ri = jnp.ones((n,), m.Float)
            for i in range(t - 1, 1, -1):       # camera side: t' = i >= 2
                ri = ri * m.safe_div(_remap0(pz(i, "rev")),
                                     _remap0(pz(i, "fwd")))
                ok = ~dz(i) & ~dz(i - 1)
                sum_ri = sum_ri + jnp.where(ok, ri, 0.0)
            ri = jnp.ones((n,), m.Float)
            for i in range(s - 1, -1, -1):      # light side: s' = i
                ri = ri * m.safe_div(_remap0(py(i, "rev")),
                                     _remap0(py(i, "fwd")))
                ok = ~dy(i) & ~dy(i - 1)
                sum_ri = sum_ri + jnp.where(ok, ri, 0.0)
            return m.safe_rcp(1.0 + sum_ri)

        def visible(p_a, ng_a, p_b, ng_b, act):
            d = p_b - p_a
            dist = m.norm(d)
            dn = d * m.safe_rcp(dist)[:, None]
            o = p_a + ng_a * (m.sign_not_zero(m.dot(ng_a, dn))
                              * m.RAY_EPS)[:, None]
            # relative end clearance (scene-scale safe; ADVICE r1)
            shadow = Ray(o=o, d=dn, maxt=dist * (1.0 - 1e-3))
            return ~ray_test(scene, shadow, act), dn, dist

        # ------------------------- strategies -------------------------
        for t in range(2, D + 2):
            zi = t - 2                       # zs index of z_{t-1}
            if zi >= D:
                break
            vz = zs[zi]

            # ---- s = 0: camera path hits an emitter ----
            has_em = vz.valid & (vz.emitter_id >= 0)
            front = m.dot(vz.wi_world, vz.ng) > 0.0
            Le = jnp.take(
                scene.emitters.radiance, jnp.maximum(vz.emitter_id, 0),
                axis=0,
            )
            act0 = has_em & front
            rev_z = {t - 1: self._pos_pdf_area(scene, vz)}
            if t >= 3:
                rev_z[t - 2] = self._emission_pdf_area(
                    scene, vz, zs[zi - 1].p, zs[zi - 1].ng
                )
            w0 = mis_weight_st(0, t, rev_z, {}, {t - 1: jnp.zeros((n,), bool)}, {})
            L = L + jnp.where(
                act0[:, None], vz.beta * Le * w0[:, None], 0.0
            )

            # ---- s >= 1: connections ----
            for s in range(1, D + 1):
                if (t - 1) + s > D:
                    break
                vy = ys[s - 1]
                if s == 1:
                    act = vz.valid & vz.smooth & y0.valid
                else:
                    act = vz.valid & vz.smooth & vy.valid & vy.smooth
                vis, dzy, dist = visible(vz.p, vz.ng, vy.p, vy.ng, act)
                act = act & vis & (dist > 1e-6)

                # f at the camera end (incident = stored, outgoing = to y)
                f_z = self._eval_at(scene, vz, vz.wi_world, dzy, act)
                if s == 1:
                    cos_y = jnp.maximum(m.dot(vy.ng, -dzy), 0.0)
                    f_y = cos_y[:, None] * jnp.ones((n, 3), m.Float)
                    act = act & (cos_y > 0.0)
                else:
                    f_y = self._eval_at(scene, vy, vy.wi_world, -dzy, act)

                C = (
                    vz.beta * f_z * f_y * vy.beta
                    * m.safe_rcp(dist * dist)[:, None]
                )

                # ---- MIS overrides for this connection ----
                rev_z = {}
                rev_y = {}
                # z_{t-1} generated from the light side:
                if s == 1:
                    rev_z[t - 1] = self._emission_pdf_area(
                        scene, vy, vz.p, vz.ng
                    )
                else:
                    rev_z[t - 1] = self._scatter_pdf_area(
                        scene, vy, vy.wi_world, -dzy, vz.p, vz.ng, act
                    )
                # z_{t-2} regenerated through z_{t-1} with light-side wi:
                if t >= 3:
                    rev_z[t - 2] = self._scatter_pdf_area(
                        scene, vz, dzy, vz.wi_world, zs[zi - 1].p,
                        zs[zi - 1].ng, act,
                    )
                # y_{s-1} generated from the camera side:
                rev_y[s - 1] = self._scatter_pdf_area(
                    scene, vz, vz.wi_world, dzy, vy.p, vy.ng, act
                )
                # y_{s-2} regenerated through y_{s-1} with camera-side wi:
                if s >= 2:
                    rev_y[s - 2] = self._scatter_pdf_area(
                        scene, vy, -dzy, vy.wi_world, ys[s - 2].p,
                        ys[s - 2].ng, act,
                    )
                w = mis_weight_st(s, t, rev_z, rev_y, {}, {})
                L = L + jnp.where(act[:, None], C * w[:, None], 0.0)

        L = jnp.where(jnp.isfinite(L), L, 0.0)
        return L, jnp.ones((n,), bool), sampler

    # ------------------------------------------------------------------
    def _sample_reference(self, scene, sampler, ray, active=None):
        """Reference semantics (bdpt02.py:276-290): unweighted (1,1)."""
        n = ray.o.shape[0]
        camera_path, sampler = self.record_camera_path(scene, sampler, ray)
        light_path, sampler = self.record_light_path(scene, sampler, n)
        L = self.connect_bdpt(scene, 1, 1, camera_path, light_path)
        L = jnp.where(jnp.isfinite(L), L, 0.0)
        return L, jnp.ones((n,), bool), sampler


register_integrator("bdpt", BDPTIntegrator)
