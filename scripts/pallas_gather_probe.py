"""VERDICT r3 #9: can a Pallas kernel beat XLA's row gather on the
dependent-chain access pattern that floors the persistent stepper?

The stepper's measured floor is ~12.3 ns/row at 65k lanes (BENCH.md
round 3) — ~28.6 GB/s effective on 352-B rows vs ~800 GB/s streaming, so
the suspicion is an ISSUE-RATE bound, not bandwidth.  This probe measures
the pure access pattern three ways on the chip, no traversal math:

  1. xla-dep:   fori_loop of `row = table[idx]; idx = f32(row[:, 0])`
                (the stepper's true dependent chain)
  2. xla-ind:   same gather volume with INDEPENDENT precomputed indices
                (separates chain latency from gather throughput)
  3. pallas:    per-lane single-row DMAs (HBM table -> VMEM buf) with
                B-way cross-lane MLP — indices live in SMEM and evolve
                inside the kernel, one DMA semaphore per in-flight lane

Chain indices are stored as exact f32 (R < 2^24) in column 0, so no
bitcast is needed in scalar code.  Each variant folds row[:, 1] into an
accumulator to keep the gather live.

Usage: python scripts/pallas_gather_probe.py [n_lanes] [iters] [block]
Reference lineage: /root/reference's megakernel leans on OptiX's hardware
BVH fetch units; this probe asks whether hand-issued DMA beats XLA's
lowering for the TPU equivalent (SURVEY.md §7 hard part #1).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial

import jax.numpy as jnp
import numpy as np

ROW = 88          # unified-table row width (floats)
R = 431_104       # rows, ~the flagship unified table


def build_table(key):
    k1, k2 = jax.random.split(key)
    nxt = jax.random.randint(k1, (R,), 0, R).astype(jnp.float32)
    body = jax.random.uniform(k2, (R, ROW - 1), jnp.float32)
    return jnp.concatenate([nxt[:, None], body], axis=1)


@partial(jax.jit, static_argnames=("iters",))
def xla_dep(table, idx0, *, iters):
    def body(_, carry):
        idx, acc = carry
        row = jnp.take(table, idx, axis=0)
        return row[:, 0].astype(jnp.int32), acc + row[:, 1]

    idx, acc = jax.lax.fori_loop(
        0, iters, body, (idx0, jnp.zeros_like(idx0, jnp.float32)))
    return idx, acc


@partial(jax.jit, static_argnames=("iters",))
def xla_ind(table, idxs, *, iters):
    # idxs: (iters, N) precomputed — no dependence between iterations
    def body(i, acc):
        row = jnp.take(table, idxs[i], axis=0)
        return acc + row[:, 1]

    return jax.lax.fori_loop(
        0, iters, body, jnp.zeros(idxs.shape[1], jnp.float32))


def pallas_dep(table, idx0, *, iters: int, block: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = idx0.shape[0]
    if n % block != 0:
        raise SystemExit(
            f"n_lanes ({n}) must be a multiple of block ({block}) — "
            "the kernel reshapes lanes to (grid, block)"
        )
    grid = n // block
    # Mosaic tiles HBM memrefs (1, 128): a 1x88 row slice is illegal, so
    # the kernel's table is padded to the 128-lane boundary (512-B rows
    # vs the stepper's 352 — the width-~free regime, BENCH.md round 2).
    rowp = ((table.shape[1] + 127) // 128) * 128
    table = jnp.pad(table, ((0, 0), (0, rowp - table.shape[1])))

    def kernel(idx_ref, table_ref, out_ref, buf, idx_smem, sem):
        pid = pl.program_id(0)

        def seed(i, _):
            idx_smem[i] = idx_ref[pid, i]
            return 0

        jax.lax.fori_loop(0, block, seed, 0)

        def chain(t, _):
            def issue(i, _):
                s = idx_smem[i]
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(s, 1)], buf.at[pl.ds(i, 1)],
                    sem.at[i],
                ).start()
                return 0

            jax.lax.fori_loop(0, block, issue, 0)

            def wait(i, _):
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(idx_smem[i], 1)],
                    buf.at[pl.ds(i, 1)], sem.at[i],
                ).wait()
                return 0

            jax.lax.fori_loop(0, block, wait, 0)

            def upd(i, _):
                idx_smem[i] = buf[i, 0].astype(jnp.int32)
                return 0

            jax.lax.fori_loop(0, block, upd, 0)
            return 0

        jax.lax.fori_loop(0, iters, chain, 0)

        def out(i, _):
            out_ref[pid, i] = idx_smem[i]
            return 0

        jax.lax.fori_loop(0, block, out, 0)

    # rank-1/odd-shaped blocked specs are illegal on TPU; indices ride as
    # FULL (grid, block) SMEM arrays with per-grid-row scalar loops (the
    # grid is a sequential loop on the one core, so scratch persists and
    # out_ref fills row by row).  The chain keeps every gather live
    # (row -> next index), so no accumulator is needed.  SMEM bounds n:
    # 2 x n x 4 B of SMEM, so probe at n <= 32768.
    fn = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),         # table stays HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((grid, block), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((block, 128), jnp.float32),
            pltpu.SMEM((block,), jnp.int32),
            pltpu.SemaphoreType.DMA((block,)),
        ],
    )
    return jax.jit(fn)(idx0.reshape(grid, block), table).reshape(n)


def bench(fn, *args, reps=3):
    # host-copy a leaf per rep: block_until_ready alone showed spurious
    # ~0.1 ms readings through the axon tunnel on repeat identical calls
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    key = jax.random.PRNGKey(0)
    table = build_table(key)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, R,
                              dtype=jnp.int32)
    rows = n * iters
    res = {}

    dt, (xi, xa) = bench(partial(xla_dep, iters=iters), table, idx0)
    res["xla_dep_ns_row"] = dt / rows * 1e9
    print(f"xla-dep: {dt:.4f}s = {dt/rows*1e9:.2f} ns/row", flush=True)

    idxs = jax.random.randint(jax.random.PRNGKey(2), (iters, n), 0, R,
                              dtype=jnp.int32)
    dt, _ = bench(partial(xla_ind, iters=iters), table, idxs)
    res["xla_ind_ns_row"] = dt / rows * 1e9
    print(f"xla-ind: {dt:.4f}s = {dt/rows*1e9:.2f} ns/row", flush=True)

    try:
        dt, pi = bench(
            partial(pallas_dep, iters=iters, block=block), table, idx0)
        ok = bool(jnp.all(pi == xi))
        res["pallas_ns_row"] = dt / rows * 1e9
        res["pallas_matches_xla"] = ok
        print(f"pallas(block={block}): {dt:.4f}s = {dt/rows*1e9:.2f} "
              f"ns/row  match={ok}", flush=True)
    except Exception as e:  # lowering blocker is an accepted outcome
        res["pallas_error"] = f"{type(e).__name__}: {e}"[:500]
        print(f"pallas blocked: {res['pallas_error']}", flush=True)

    res.update(n_lanes=n, iters=iters, block=block, row_floats=ROW,
               table_rows=R)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
