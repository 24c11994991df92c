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
    triangles.  Bigger scenes stay on the XLA path; the A/B against it is
    scripts/pallas_trav_bench.py.
  * int32 child codes / face ids CANNOT ride the f32 matmul as bitcasts
    (small int32 bit patterns are f32 denormals and TPUs flush them): they
    are stored as exact float VALUES (< 2^24) and rounded back after gather.
  * Mosaic's vector layouts are strictly 2-D: no (tile, 8, 6) bound
    reshapes, no (tile, 8, 8) rank tensors, no 1-D lane vectors.  The
    kernel therefore unrolls the 8 children in Python, keeps every per-lane
    quantity as a (tile, 1) column, and writes the per-lane stack with
    unrolled (tile, STACK_DEPTH) one-hot selects instead of scatters.

Semantics match bvh_jax._traverse exactly (same slab/Moller-Trumbore tests,
same far-to-near push ordering); equality is tested on the sphere scene in
interpret mode and on hardware by the bench script.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..scene.bvh8 import LEAF_CAP, STACK_DEPTH

WIDTH = 8
DONE = -1


def pack_tables(bvh):
    """BVH8 arrays -> (node_tab, leaf_tab) float tables for the kernel.

    node_tab (R, 56): [8 child codes as float values | 48 bounds floats]
    leaf_tab (L, 10*LEAF_CAP): [9*LEAF_CAP triangle vertex floats |
                                LEAF_CAP face ids as floats]
    """
    from ..scene.bvh8 import FACE_OFF, LEAF_ROW

    from ..scene.bvh8 import NODE_BASE, WIDTH as BW

    assert BW == 8, "the Pallas kernel is written for the 8-wide layout"
    codes = jax.lax.bitcast_convert_type(
        bvh.nodes[:, 0:BW], jnp.int32
    ).astype(jnp.float32)
    node_tab = jnp.concatenate(
        [codes, bvh.nodes[:, NODE_BASE : NODE_BASE + 6 * BW]], axis=1
    )
    faces = jax.lax.bitcast_convert_type(
        bvh.leaf_tris[:, FACE_OFF:LEAF_ROW], jnp.int32
    ).astype(jnp.float32)
    leaf_tab = jnp.concatenate(
        [bvh.leaf_tris[:, : 9 * LEAF_CAP], faces], axis=1
    )
    return node_tab, leaf_tab


def _onehot_gather(table_ref, idx_col, rows: int):
    """Per-lane row fetch as a one-hot MXU matmul: (T,1) int32 -> (T, C)."""
    t = idx_col.shape[0]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (t, rows), 1) == idx_col
    ).astype(jnp.float32)
    return jax.lax.dot_general(
        onehot, table_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot3(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)        # (T,3)x(T,3)->(T,1)


def _cross3(a, b):
    ax, ay, az = a[:, 0:1], a[:, 1:2], a[:, 2:3]
    bx, by, bz = b[:, 0:1], b[:, 1:2], b[:, 2:3]
    return jnp.concatenate(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=1
    )


def _kernel(node_ref, leaf_ref, o_ref, d_ref, maxt_ref, active_ref,
            t_ref, face_ref, u_ref, v_ref, *, n_nodes: int, n_leaves: int,
            any_hit: bool):
    o = o_ref[...]                                       # (T, 3)
    d = d_ref[...]
    tile = o.shape[0]
    inv_d = jnp.where(d != 0.0, 1.0 / jnp.where(d == 0.0, 1.0, d), jnp.inf)
    active = active_ref[...] != 0                        # (T, 1)

    t_best = jnp.where(active, maxt_ref[...], 0.0)       # (T, 1)
    face_best = jnp.full((tile, 1), -1, jnp.int32)
    u_best = jnp.zeros((tile, 1), jnp.float32)
    v_best = jnp.zeros((tile, 1), jnp.float32)
    cur = jnp.where(active, jnp.int32(0), jnp.int32(DONE))
    stack = jnp.zeros((tile, STACK_DEPTH), jnp.float32)
    sp = jnp.zeros((tile, 1), jnp.int32)
    si = jax.lax.broadcasted_iota(jnp.int32, (tile, STACK_DEPTH), 1)
    ko = jax.lax.broadcasted_iota(jnp.int32, (tile, WIDTH), 1)

    def cond(state):
        return jnp.any(state[0] != DONE)

    def body(state):
        cur, sp, stack, t_best, face_best, u_best, v_best = state
        live = cur != DONE
        is_int = cur >= 0
        is_leaf = cur <= -2

        # ---------------- internal: one-hot row, 8 slab tests --------------
        row = _onehot_gather(node_ref, jnp.where(is_int, cur, 0), n_nodes)
        codes = jnp.round(row[:, 0:WIDTH]).astype(jnp.int32)   # (T, 8)
        near_cols = []
        far_cols = []
        for k in range(WIDTH):
            lo = row[:, 8 + 6 * k : 11 + 6 * k]
            hi = row[:, 11 + 6 * k : 14 + 6 * k]
            t0 = (lo - o) * inv_d
            t1 = (hi - o) * inv_d
            near_cols.append(
                jnp.max(jnp.minimum(t0, t1), axis=-1, keepdims=True)
            )
            far_cols.append(
                jnp.min(jnp.maximum(t0, t1), axis=-1, keepdims=True)
            )
        t_near = jnp.concatenate(near_cols, axis=1)            # (T, 8)
        t_far = jnp.concatenate(far_cols, axis=1)
        hit = (
            (t_near <= t_far * 1.00000024) & (t_far > 0.0)
            & (t_near < t_best) & (codes != DONE) & is_int
        )

        t_sort = jnp.where(hit, t_near, jnp.inf)
        t_min = jnp.min(t_sort, axis=-1, keepdims=True)
        is_min = (t_sort == t_min) & hit
        # first-set-column one-hot via unrolled prefix-or (Mosaic has no
        # cumsum lowering).  Computed in int32: concatenating i1 vregs
        # trips an invalid bitcast_vreg in Mosaic, i32 concat lowers fine.
        seen = jnp.zeros((tile, 1), jnp.int32)
        first_cols = []
        for k in range(WIDTH):
            col = is_min[:, k : k + 1].astype(jnp.int32)
            first_cols.append(col * (1 - seen))
            seen = jnp.maximum(seen, col)
        onehot_near = jnp.concatenate(first_cols, axis=1) > 0
        any_child = jnp.any(hit, axis=-1, keepdims=True)
        near_code = jnp.sum(
            jnp.where(onehot_near, codes, 0), axis=-1, keepdims=True
        )

        # far-to-near push ordering: per-child rank from 2-D column compares
        push_mask = hit & ~onehot_near
        n_push = jnp.sum(
            push_mask.astype(jnp.int32), axis=-1, keepdims=True
        )
        tp = jnp.where(push_mask, t_near, -jnp.inf)
        codes_f = codes.astype(jnp.float32)
        for k in range(WIDTH):
            tpk = tp[:, k : k + 1]
            pk = push_mask[:, k : k + 1]
            farther = ((tp > tpk) | ((tp == tpk) & (ko > k))) & push_mask
            rank_k = jnp.sum(
                farther.astype(jnp.int32), axis=-1, keepdims=True
            )
            pos_k = sp + rank_k                                # (T, 1)
            sel = (si == pos_k) & pk & (pos_k < STACK_DEPTH)
            stack = jnp.where(sel, codes_f[:, k : k + 1], stack)

        # ---------------- leaf: one-hot row, 8 triangle tests --------------
        leaf_id = jnp.where(is_leaf, -cur - 2, 0)
        trow = _onehot_gather(leaf_ref, leaf_id, n_leaves)
        frow = jnp.round(
            trow[:, 9 * LEAF_CAP : 10 * LEAF_CAP]
        ).astype(jnp.int32)
        for k in range(LEAF_CAP):
            g9 = trow[:, 9 * k : 9 * k + 9]
            v0 = g9[:, 0:3]
            e1 = g9[:, 3:6] - v0
            e2 = g9[:, 6:9] - v0
            pvec = _cross3(d, e2)
            det = _dot3(e1, pvec)
            inv_det = jnp.where(
                det != 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0
            )
            tvec = o - v0
            uu = _dot3(tvec, pvec) * inv_det
            qvec = _cross3(tvec, e1)
            vv = _dot3(d, qvec) * inv_det
            tt = _dot3(e2, qvec) * inv_det
            h = (
                (jnp.abs(det) > 1e-10)
                & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                & (tt > 0.0) & (tt < t_best)
            )
            ok = is_leaf & h & (frow[:, k : k + 1] >= 0)
            t_best = jnp.where(ok, tt, t_best)
            face_best = jnp.where(ok, frow[:, k : k + 1], face_best)
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
        top_sel = si == jnp.clip(sp_new - 1, 0, STACK_DEPTH - 1)
        top_f = jnp.sum(
            jnp.where(top_sel, stack, 0.0), axis=-1, keepdims=True
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

    def p2(x, fill=0):
        x = x.reshape(n, -1)
        return jnp.pad(x, [(0, pad), (0, 0)], constant_values=fill)

    o_p, d_p = p2(o), p2(d)
    maxt_p = p2(maxt)
    act_p = p2(active.astype(jnp.int32))

    grid = (n_pad // tile,)
    kern = functools.partial(
        _kernel, n_nodes=node_tab.shape[0], n_leaves=leaf_tab.shape[0],
        any_hit=any_hit,
    )
    # the default 16 MiB scoped-vmem limit undercounts what v5e physically
    # has; the tables alone are ~9 MiB for a 200k-tri scene
    try:
        from jax.experimental.pallas import tpu as pltpu

        params = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
        )
    except Exception:
        params = {}
    t, face, u, v = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(node_tab.shape, lambda i: (0, 0)),
            pl.BlockSpec(leaf_tab.shape, lambda i: (0, 0)),
            pl.BlockSpec((tile, 3), lambda i: (i, 0)),
            pl.BlockSpec((tile, 3), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        interpret=interpret,
        **({} if interpret else params),
    )(node_tab, leaf_tab, o_p, d_p, maxt_p, act_p)
    return t[:n, 0], face[:n, 0], u[:n, 0], v[:n, 0]
