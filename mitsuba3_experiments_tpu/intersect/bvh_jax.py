"""Vectorized BVH traversal: scene.ray_intersect / ray_test, the TPU way.

Replaces the OptiX RTX / Embree backends (SURVEY.md section 2.2; usage
/root/reference/path.py:238,281, restirgi.py:320,346).  All rays traverse in
lockstep inside one `lax.while_loop`: each lane walks its own path through the
*implicit* binary BVH (children of node i are 2i+1/2i+2 — see scene/bvh.py),
so the only memory traffic is bounds/triangle gathers; there are no child
pointer fetches and no divergence beyond per-lane masks.  Leaf hits test a
`leaf_size` packet of pre-gathered triangles (scene.tri_verts) per step.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.records import Ray, SurfaceInteraction
from ..scene.types import Scene
from .triangle import intersect_tri

STACK_DEPTH = 32
DONE = jnp.int32(-1)


def _slab_test(o, inv_d, lo, hi, t_best):
    """Ray/AABB slab test. lo, hi: (..., 3). Returns (hit, t_near)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    t_near = jnp.max(tmin, axis=-1)
    t_far = jnp.min(tmax, axis=-1)
    hit = (t_near <= t_far * 1.00000024) & (t_far > 0.0) & (t_near < t_best)
    return hit, t_near


@partial(jax.jit, static_argnames=("max_leaf", "any_hit"))
def _traverse(bvh_lo, bvh_hi, left, right, first, count, tri_verts,
              max_leaf, o, d, maxt, active, any_hit: bool = False):
    """Core traversal over the pointer BVH.  Returns (t, prim_slot, u, v).

    Node metadata is packed into two tables before the loop so each
    iteration issues one (N,4) int gather + one (N,2,6) float gather instead
    of eight separate row gathers (loop-invariant packing is hoisted by XLA).
    """
    n = o.shape[0]
    inv_d = m.safe_div(jnp.ones((), m.Float), d, fill=jnp.inf)

    # packed tables: meta = [left,right,first,count]; bounds6 = [lo|hi]
    meta = jnp.stack([left, right, first, count], axis=1)      # (NN, 4)
    bounds6 = jnp.concatenate([bvh_lo, bvh_hi], axis=1)        # (NN, 6)

    t_best = jnp.where(active, maxt, 0.0)  # inactive lanes terminate instantly
    slot_best = jnp.full((n,), -1, jnp.int32)
    u_best = jnp.zeros((n,), m.Float)
    v_best = jnp.zeros((n,), m.Float)

    node = jnp.where(active, jnp.zeros((n,), jnp.int32), DONE)
    stack = jnp.zeros((n, STACK_DEPTH), jnp.int32)
    sp = jnp.zeros((n,), jnp.int32)

    def cond(state):
        node, *_ = state
        return jnp.any(node != DONE)

    def body(state):
        node, sp, stack, t_best, slot_best, u_best, v_best = state
        live = node != DONE
        node_s = jnp.maximum(node, 0)

        md = jnp.take(meta, node_s, axis=0)                    # (N, 4)
        c0 = md[:, 0]
        c1 = md[:, 1]
        is_leaf = live & (c0 < 0)
        is_int = live & ~is_leaf

        # ---------------- internal: test both child boxes ----------------
        c0s = jnp.where(is_int, c0, 0)
        c1s = jnp.where(is_int, c1, 0)
        bb = jnp.take(
            bounds6, jnp.stack([c0s, c1s], axis=1), axis=0
        )                                                      # (N, 2, 6)
        h0, tn0 = _slab_test(o, inv_d, bb[:, 0, :3], bb[:, 0, 3:], t_best)
        h1, tn1 = _slab_test(o, inv_d, bb[:, 1, :3], bb[:, 1, 3:], t_best)
        h0 &= is_int
        h1 &= is_int

        near_is_0 = tn0 <= tn1
        near = jnp.where(near_is_0, c0, c1)
        far = jnp.where(near_is_0, c1, c0)
        hit_near = jnp.where(near_is_0, h0, h1)
        hit_far = jnp.where(near_is_0, h1, h0)
        # if only far hit, descend it directly
        next_int = jnp.where(hit_near, near, jnp.where(hit_far, far, DONE))
        push = hit_near & hit_far

        # ------------------- leaf: triangle packet test -------------------
        base = jnp.where(is_leaf, md[:, 2], 0)
        k = jnp.arange(max_leaf, dtype=jnp.int32)[None, :]
        slots = base[:, None] + k
        in_leaf = k < md[:, 3][:, None]
        tris = jnp.take(tri_verts, slots, axis=0)  # (N, K, 3, 3)
        t, uu, vv, hit = intersect_tri(o, d, tris, t_best)
        t = jnp.where(is_leaf[:, None] & in_leaf & hit, t, jnp.inf)
        k_best = jnp.argmin(t, axis=-1)
        t_new = jnp.take_along_axis(t, k_best[:, None], axis=-1)[:, 0]
        improved = t_new < t_best
        t_best = jnp.where(improved, t_new, t_best)
        slot_new = base + k_best.astype(jnp.int32)
        slot_best = jnp.where(improved, slot_new, slot_best)
        u_best = jnp.where(
            improved, jnp.take_along_axis(uu, k_best[:, None], -1)[:, 0], u_best
        )
        v_best = jnp.where(
            improved, jnp.take_along_axis(vv, k_best[:, None], -1)[:, 0], v_best
        )
        if any_hit:
            # shadow rays: a hit ends the lane
            early_done = is_leaf & (slot_best >= 0)
        else:
            early_done = jnp.zeros_like(is_leaf)

        # ---------------------- stack push / pop -------------------------
        # leaves always pop; internals pop when neither child hit
        want_pop = (is_leaf & ~early_done) | (is_int & (next_int == DONE))
        sp_c = jnp.clip(sp, 0, STACK_DEPTH - 1)
        top = jnp.take_along_axis(stack, sp_c[:, None] - 1, axis=1)[:, 0]
        popped = jnp.where(sp > 0, top, DONE)

        next_node = jnp.where(
            is_int & (next_int != DONE), next_int,
            jnp.where(want_pop, popped, DONE),
        )
        next_node = jnp.where(live & ~early_done, next_node, DONE)

        sp_after = jnp.where(want_pop & (sp > 0), sp - 1, sp)
        # push far child
        stack = jnp.where(
            push[:, None]
            & (jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :] == sp_after[:, None]),
            far[:, None],
            stack,
        )
        sp_after = jnp.where(push, sp_after + 1, sp_after)
        sp_after = jnp.where(next_node == DONE, 0, sp_after)

        return (next_node, sp_after, stack, t_best, slot_best, u_best, v_best)

    # Degenerate single-leaf tree: root (node 0) is itself the leaf when
    # n_leaves == 1 -> first_leaf == 0, handled naturally by is_leaf.
    state = (node, sp, stack, t_best, slot_best, u_best, v_best)
    node, sp, stack, t_best, slot_best, u_best, v_best = jax.lax.while_loop(
        cond, body, state
    )
    t_out = jnp.where(slot_best >= 0, t_best, jnp.inf)
    return t_out, slot_best, u_best, v_best


# Scenes at or below this many triangle slots skip the BVH entirely: a dense
# all-triangles test is pure VPU work with zero gathers — faster on TPU for
# small scenes (cornell box) and exactly what the MXU-friendly layout wants.
BRUTE_FORCE_MAX_SLOTS = 64


def ray_intersect(scene: Scene, ray: Ray, active=None) -> SurfaceInteraction:
    """Closest-hit query returning a full SurfaceInteraction."""
    n = ray.o.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    if scene.tri_verts.shape[0] <= BRUTE_FORCE_MAX_SLOTS:
        return ray_intersect_brute(scene, ray, active)
    b = scene.bvh
    t, slot, u, v = _traverse(
        b.bounds_lo, b.bounds_hi, b.left, b.right, b.first, b.count,
        scene.tri_verts, b.max_leaf,
        ray.o, ray.d, ray.maxt, active, False,
    )
    return _make_si(scene, ray, t, slot, u, v)


def ray_test(scene: Scene, ray: Ray, active=None):
    """Any-hit (shadow) query: True where the segment (0, maxt) is occluded."""
    n = ray.o.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    if scene.tri_verts.shape[0] <= BRUTE_FORCE_MAX_SLOTS:
        si = ray_intersect_brute(scene, ray, active)
        return si.prim_idx >= 0
    b = scene.bvh
    t, slot, _, _ = _traverse(
        b.bounds_lo, b.bounds_hi, b.left, b.right, b.first, b.count,
        scene.tri_verts, b.max_leaf,
        ray.o, ray.d, ray.maxt, active, True,
    )
    return slot >= 0


def ray_intersect_brute(scene: Scene, ray: Ray, active=None) -> SurfaceInteraction:
    """Oracle path: test every triangle (used by tests to validate the BVH)."""
    n = ray.o.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    P = scene.tri_verts.shape[0]
    maxt = jnp.where(active, ray.maxt, 0.0)
    # (1, P, 3, 3) broadcasts against (N, 1, 3) rays — XLA fuses, no materialize
    t, u, v, hit = intersect_tri(
        ray.o, ray.d, scene.tri_verts[None, :, :, :], maxt
    )
    # mask tail padding slots (tri_verts is padded past len(prim_order))
    valid_slot = (
        jnp.arange(P, dtype=jnp.int32) < scene.bvh.prim_order.shape[0]
    )
    t = jnp.where(valid_slot[None, :], t, jnp.inf)
    k = jnp.argmin(t, axis=-1)
    tb = jnp.take_along_axis(t, k[:, None], -1)[:, 0]
    slot = jnp.where(jnp.isfinite(tb), k.astype(jnp.int32), -1)
    ub = jnp.take_along_axis(u, k[:, None], -1)[:, 0]
    vb = jnp.take_along_axis(v, k[:, None], -1)[:, 0]
    return _make_si(scene, ray, jnp.where(slot >= 0, tb, jnp.inf), slot, ub, vb)


def _make_si(scene: Scene, ray: Ray, t, slot, u, v) -> SurfaceInteraction:
    """Assemble the SurfaceInteraction from a hit (slot into BVH prim order)."""
    g = scene.geometry
    valid = slot >= 0
    slot_s = jnp.maximum(slot, 0)
    face = jnp.take(scene.bvh.prim_order, slot_s)
    face = jnp.where(valid, face, 0)

    fidx = jnp.take(g.faces, face, axis=0)            # (N, 3)
    v0 = jnp.take(g.vertices, fidx[:, 0], axis=0)
    v1 = jnp.take(g.vertices, fidx[:, 1], axis=0)
    v2 = jnp.take(g.vertices, fidx[:, 2], axis=0)
    e1 = v1 - v0
    e2 = v2 - v0
    p = v0 + e1 * u[:, None] + v[:, None] * e2
    ng = m.normalize(m.cross(e1, e2))

    flat = jnp.take(g.face_flat, face)
    n0 = jnp.take(g.normals, fidx[:, 0], axis=0)
    n1 = jnp.take(g.normals, fidx[:, 1], axis=0)
    n2 = jnp.take(g.normals, fidx[:, 2], axis=0)
    ns = m.normalize(
        n0 * (1.0 - u - v)[:, None] + n1 * u[:, None] + n2 * v[:, None]
    )
    ns = jnp.where(flat[:, None], ng, ns)
    # keep shading normal in the same hemisphere as the geometric one
    ns = jnp.where(m.dot(ns, ng)[:, None] < 0.0, -ns, ns)

    uv0 = jnp.take(g.uvs, fidx[:, 0], axis=0)
    uv1 = jnp.take(g.uvs, fidx[:, 1], axis=0)
    uv2 = jnp.take(g.uvs, fidx[:, 2], axis=0)
    uv = uv0 * (1.0 - u - v)[:, None] + uv1 * u[:, None] + uv2 * v[:, None]

    sh_s, sh_t = m.coordinate_system(ns)
    wi = m.to_local(sh_s, sh_t, ns, -ray.d)

    inval = ~valid
    return SurfaceInteraction(
        t=jnp.where(valid, t, jnp.inf),
        p=jnp.where(inval[:, None], 0.0, p),
        n=jnp.where(inval[:, None], jnp.array([0.0, 0.0, 1.0]), ng),
        sh_n=jnp.where(inval[:, None], jnp.array([0.0, 0.0, 1.0]), ns),
        sh_s=jnp.where(inval[:, None], jnp.array([1.0, 0.0, 0.0]), sh_s),
        sh_t=jnp.where(inval[:, None], jnp.array([0.0, 1.0, 0.0]), sh_t),
        uv=jnp.where(inval[:, None], 0.0, uv),
        wi=jnp.where(inval[:, None], jnp.array([0.0, 0.0, 1.0]), wi),
        prim_idx=jnp.where(valid, face, -1),
        mat_id=jnp.where(valid, jnp.take(g.face_mat, face), -1),
        emitter_id=jnp.where(valid, jnp.take(g.face_emitter, face), -1),
    )
