"""Pallas BVH traversal kernel: per-tile while loops, VMEM-resident tree.

VERDICT r1 #4 / SURVEY hard part #1: the XLA `lax.while_loop` traversal
(bvh_jax.py) is lockstep over the whole launch — every lane iterates until
the LAST lane finishes, and each iteration pays two XLA row gathers
(~0.1-0.35 ms each on the axon TPU, size-independent).  This kernel changes
both terms:

  * the ray stream is tiled by the Pallas grid; each tile runs its OWN
    traversal loop and exits when its rays are done — the round-1 "small
    chunk" divergence win (BENCH.md: 768-lane launches beat 16k by 82%)
    without per-launch dispatch/compile overhead, inside ONE kernel;
  * the whole tree lives in VMEM and per-lane row fetches are one-hot
    matmuls on the MXU ((tile, rows) @ (rows, 56|80)), replacing the
    latency-bound XLA gathers with a few microseconds of systolic work.

Constraints that shape the design (measured/architectural, not stylistic):

  * Mosaic has no per-lane dynamic gather from HBM, so the tree must fit in
    VMEM: ~56 B/internal row + 320 B/leaf row -> scenes up to roughly 200k
    triangles.  Bigger scenes stay on the XLA path (ray_intersect dispatches
    by size); the A/B against it is scripts/pallas_trav_bench.py.
  * int32 child codes / face ids CANNOT ride the f32 matmul as bitcasts
    (small int32 bit patterns are f32 denormals and TPUs flush them): they
    are stored as exact float VALUES (< 2^24) and rounded back after gather.
  * per-lane stacks are dense (tile, depth) arrays updated with one-hot
    masks — no scatter inside the kernel.

Semantics match bvh_jax._traverse exactly (same slab/Moller-Trumbore tests,
same far-to-near push ordering); equality is tested on the sphere scene in
interpret mode and on hardware by the bench script.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import math as m
from ..scene.bvh8 import STACK_DEPTH

WIDTH = 8
DONE = -1


def pack_tables(bvh):
    """BVH8 arrays -> (node_tab, leaf_tab) float tables for the kernel.

    node_tab (R, 56): [8 child codes as float values | 48 bounds floats]
    leaf_tab (L, 80): [72 triangle vertex floats | 8 face ids as floats]
    """
    codes = jax.lax.bitcast_convert_type(
        bvh.nodes[:, 0:8], jnp.int32
    ).astype(jnp.float32)
    node_tab = jnp.concatenate([codes, bvh.nodes[:, 8:56]], axis=1)
    faces = jax.lax.bitcast_convert_type(
        bvh.leaf_tris[:, 80:88], jnp.int32
    ).astype(jnp.float32)
    leaf_tab = jnp.concatenate([bvh.leaf_tris[:, 0:72], faces], axis=1)
    return node_tab, leaf_tab


def _onehot_gather(table_ref, idx, rows: int):
    """Per-lane row fetch as a one-hot MXU matmul: (T,) int32 -> (T, C)."""
    t = idx.shape[0]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (t, rows), 1) == idx[:, None]
    ).astype(jnp.float32)
    return jax.lax.dot_general(
        onehot, table_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(node_ref, leaf_ref, o_ref, d_ref, maxt_ref, active_ref,
            t_ref, face_ref, u_ref, v_ref, *, n_nodes: int, n_leaves: int,
            any_hit: bool):
    o = o_ref[...]
    d = d_ref[...]
    tile = o.shape[0]
    inv_d = m.safe_div(jnp.ones((), jnp.float32), d, fill=jnp.inf)
    active = active_ref[...] != 0

    t_best = jnp.where(active, maxt_ref[...], 0.0)
    face_best = jnp.full((tile,), -1, jnp.int32)
    u_best = jnp.zeros((tile,), jnp.float32)
    v_best = jnp.zeros((tile,), jnp.float32)
    cur = jnp.where(active, jnp.int32(0), jnp.int32(DONE))
    stack = jnp.zeros((tile, STACK_DEPTH), jnp.float32)
    sp = jnp.zeros((tile,), jnp.int32)
    ki = jax.lax.broadcasted_iota(jnp.int32, (tile, WIDTH), 1)
    si = jax.lax.broadcasted_iota(jnp.int32, (tile, STACK_DEPTH), 1)

    def cond(state):
        return jnp.any(state[0] != DONE)

    def body(state):
        cur, sp, stack, t_best, face_best, u_best, v_best = state
        live = cur != DONE
        is_int = cur >= 0
        is_leaf = cur <= -2

        # ---------------- internal: one-hot row, 8 slab tests --------------
        row = _onehot_gather(node_ref, jnp.where(is_int, cur, 0), n_nodes)
        codes = jnp.round(row[:, 0:8]).astype(jnp.int32)
        bb = row[:, 8:56].reshape(tile, WIDTH, 6)
        t0 = (bb[:, :, 0:3] - o[:, None, :]) * inv_d[:, None, :]
        t1 = (bb[:, :, 3:6] - o[:, None, :]) * inv_d[:, None, :]
        t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (
            (t_near <= t_far * 1.00000024) & (t_far > 0.0)
            & (t_near < t_best[:, None]) & (codes != DONE)
            & is_int[:, None]
        )

        t_sort = jnp.where(hit, t_near, jnp.inf)
        k_near = jnp.argmin(t_sort, axis=-1)
        any_child = jnp.any(hit, axis=-1)
        onehot_near = ki == k_near[:, None]
        near_code = jnp.sum(jnp.where(onehot_near, codes, 0), axis=-1)

        push_mask = hit & ~onehot_near
        n_push = jnp.sum(push_mask.astype(jnp.int32), axis=-1)
        if any_hit:
            pm = push_mask.astype(jnp.int32)
            rank_far = jnp.cumsum(pm, axis=-1) - pm
        else:
            tp = jnp.where(push_mask, t_near, -jnp.inf)
            farther = (
                (tp[:, None, :] > tp[:, :, None])
                | ((tp[:, None, :] == tp[:, :, None])
                   & (ki[:, None, :] > ki[:, :, None]))
            ) & push_mask[:, None, :]
            rank_far = jnp.sum(farther.astype(jnp.int32), axis=-1)
        push_pos = sp[:, None] + rank_far                       # (T, 8)
        # dense one-hot stack write: sum_k onehot(pos_k) * code_k
        sel = (
            (si[:, None, :] == push_pos[:, :, None])
            & push_mask[:, :, None]
            & (push_pos < STACK_DEPTH)[:, :, None]
        )                                                       # (T, 8, SD)
        upd = jnp.sum(
            jnp.where(sel, codes.astype(jnp.float32)[:, :, None], 0.0), axis=1
        )
        written = jnp.any(sel, axis=1)
        stack = jnp.where(written, upd, stack)

        # ---------------- leaf: one-hot row, 8 triangle tests --------------
        leaf_id = jnp.where(is_leaf, -cur - 2, 0)
        trow = _onehot_gather(leaf_ref, leaf_id, n_leaves)
        frow = jnp.round(trow[:, 72:80]).astype(jnp.int32)
        for k in range(WIDTH):
            g9 = trow[:, 9 * k : 9 * k + 9]
            v0 = g9[:, 0:3]
            e1 = g9[:, 3:6] - v0
            e2 = g9[:, 6:9] - v0
            pvec = m.cross(d, e2)
            det = m.dot(e1, pvec)
            inv_det = m.safe_div(jnp.ones((), det.dtype), det)
            tvec = o - v0
            uu = m.dot(tvec, pvec) * inv_det
            qvec = m.cross(tvec, e1)
            vv = m.dot(d, qvec) * inv_det
            tt = m.dot(e2, qvec) * inv_det
            h = (
                (jnp.abs(det) > 1e-10)
                & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                & (tt > 0.0) & (tt < t_best)
            )
            ok = is_leaf & h & (frow[:, k] >= 0)
            t_best = jnp.where(ok, tt, t_best)
            face_best = jnp.where(ok, frow[:, k], face_best)
            u_best = jnp.where(ok, uu, u_best)
            v_best = jnp.where(ok, vv, v_best)

        if any_hit:
            early_done = is_leaf & (face_best >= 0)
        else:
            early_done = jnp.zeros_like(is_leaf)

        # ------------------------- pop / descend ---------------------------
        descend = is_int & any_child
        sp_new = jnp.where(
            descend, jnp.minimum(sp + n_push, STACK_DEPTH), sp
        )
        want_pop = live & ~early_done & ~descend
        top_f = jnp.sum(
            jnp.where(
                si == jnp.clip(sp_new - 1, 0, STACK_DEPTH - 1)[:, None],
                stack, 0.0,
            ),
            axis=-1,
        )
        popped = jnp.where(
            sp_new > 0, jnp.round(top_f).astype(jnp.int32), DONE
        )
        nxt = jnp.where(
            descend, near_code, jnp.where(want_pop, popped, DONE)
        )
        nxt = jnp.where(live & ~early_done, nxt, DONE)
        sp_new = jnp.where(want_pop & (sp_new > 0), sp_new - 1, sp_new)
        sp_new = jnp.where(nxt == DONE, 0, sp_new)
        return (nxt, sp_new, stack, t_best, face_best, u_best, v_best)

    state = (cur, sp, stack, t_best, face_best, u_best, v_best)
    _, _, _, t_best, face_best, u_best, v_best = jax.lax.while_loop(
        cond, body, state
    )
    t_ref[...] = jnp.where(face_best >= 0, t_best, jnp.inf)
    face_ref[...] = face_best
    u_ref[...] = u_best
    v_ref[...] = v_best


@functools.partial(
    jax.jit, static_argnames=("tile", "any_hit", "interpret")
)
def traverse_pallas(node_tab, leaf_tab, o, d, maxt, active, *,
                    tile: int = 512, any_hit: bool = False,
                    interpret: bool = False):
    """Pallas traversal over `tile`-ray blocks; same outputs as
    bvh_jax._traverse: (t, face, u, v), face == -1 for misses."""
    from jax.experimental import pallas as pl

    n = o.shape[0]
    n_pad = (n + tile - 1) // tile * tile
    pad = n_pad - n

    def p(x, fill=0):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    o_p, d_p = p(o), p(d)
    maxt_p = p(maxt)
    act_p = p(active.astype(jnp.int32))

    grid = (n_pad // tile,)
    kern = functools.partial(
        _kernel, n_nodes=node_tab.shape[0], n_leaves=leaf_tab.shape[0],
        any_hit=any_hit,
    )
    t, face, u, v = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(node_tab.shape, lambda i: (0, 0)),
            pl.BlockSpec(leaf_tab.shape, lambda i: (0, 0)),
            pl.BlockSpec((tile, 3), lambda i: (i, 0)),
            pl.BlockSpec((tile, 3), lambda i: (i, 0)),
            pl.BlockSpec((tile,), lambda i: (i,)),
            pl.BlockSpec((tile,), lambda i: (i,)),
        ],
        out_specs=[
            pl.BlockSpec((tile,), lambda i: (i,)),
            pl.BlockSpec((tile,), lambda i: (i,)),
            pl.BlockSpec((tile,), lambda i: (i,)),
            pl.BlockSpec((tile,), lambda i: (i,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        ],
        interpret=interpret,
    )(node_tab, leaf_tab, o_p, d_p, maxt_p, act_p)
    return t[:n], face[:n], u[:n], v[:n]
