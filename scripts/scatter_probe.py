"""Scatter cost model on the chip: the round-5 parts probe measured the
pipelined retire at 6.8 ms/round — two 65k-row scatter-SETs into the
3.7M-row deferred-radiance buffer.  This probe isolates the scatter's cost
drivers: row count, duplicate destinations (all idle/pad lanes write one
shared dump row today — the gather analog measured duplicates 1.45x
slower), realistic retire mixes, and the spread-pad fix (pad lane i ->
dedicated dump row beyond the frame).

Usage: python scripts/scatter_probe.py [n_lanes] [n_rows]
"""
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=5, iters=32):
    @jax.jit
    def run(buf, *a):
        def body(_, b):
            return fn(b, *a)
        return jax.lax.fori_loop(0, iters, body, buf)

    out = run(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        o = run(*args)
        float(jnp.sum(o[0]))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 3_686_400
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    buf = jnp.zeros((rows + n + 1, 3), jnp.float32)
    val = jnp.ones((n, 3), jnp.float32)
    uniq = jax.random.permutation(key, rows)[:n].astype(jnp.uint32)
    same = jnp.full((n,), rows, jnp.uint32)
    # realistic retire mix: ~11% real unique + 89% shared pad row
    frac = n // 9
    mix_pad = jnp.where(jnp.arange(n) < frac, uniq, same)
    # spread-pad fix: pad lane i writes dedicated dump row rows+1+i
    spread = (rows + 1 + jnp.arange(n, dtype=jnp.uint32))
    mix_spread = jnp.where(jnp.arange(n) < frac, uniq, spread)

    def sc(buf, dst):
        return buf.at[dst].set(val)

    for name, dst in [("unique", uniq), ("all-same (pad)", same),
                      ("11% real + same-pad", mix_pad),
                      ("11% real + spread-pad", mix_spread)]:
        t = bench(sc, buf, dst)
        print(f"# scatter-set {name:24s}: {t*1e3:7.3f} ms "
              f"({t/n*1e9:6.2f} ns/row)", flush=True)

    # scatter width: the d65 recorder flushes (D+1, 4) = 264-f32 rows
    for width in (4, 36, 264):
        bw = jnp.zeros((rows + n + 1, width), jnp.float32)
        vw = jnp.ones((n, width), jnp.float32)

        def scw(b, dst, v=vw):
            return b.at[dst].set(v)

        t = bench(scw, bw, mix_spread)
        print(f"# scatter-set width {width:4d} spread  : {t*1e3:7.3f} ms "
              f"({t/n*1e9:6.2f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
