"""Cost of the compaction primitives on the chip: can the transition
shade a COMPACTED subset?  Needs a permutation: either argsort on the
ready flag (stable partition), a scalar-row scatter of ranks, or top_k.
The scatter probe priced the scatter route (52 ns/row = 6.8 ms at 131k —
dead); this prices sort/top_k and the compact gather+scatter-back pair.

Usage: python scripts/sort_probe.py [n]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=5, iters=16):
    @jax.jit
    def run(*a):
        def body(i, acc):
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    out = run(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        o = run(*args)
        float(o)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    C = n // 4
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    ready = jax.random.bernoulli(key, 0.4, (n,))
    keys32 = (~ready).astype(jnp.uint32)  # ready-first stable partition
    payload = jnp.arange(n, dtype=jnp.uint32)
    F = 28
    table = jax.random.normal(key, (n, F), jnp.float32)

    t = bench(lambda: jnp.sort(jax.random.normal(key, (n,))))
    print(f"# sort f32 {n}: {t*1e3:7.3f} ms", flush=True)
    t = bench(lambda: jax.lax.sort_key_val(keys32, payload))
    print(f"# sort_key_val u32+u32 {n}: {t*1e3:7.3f} ms", flush=True)
    t = bench(lambda: jax.lax.top_k(ready.astype(jnp.float32), C))
    print(f"# top_k C={C}: {t*1e3:7.3f} ms", flush=True)
    t = bench(lambda: jnp.argsort(keys32, stable=True))
    print(f"# argsort u32 {n}: {t*1e3:7.3f} ms", flush=True)

    # the full compact-shade-scatter round trip at C rows
    _, perm = jax.lax.sort_key_val(keys32, payload)

    def roundtrip():
        idxC = perm[:C]
        rows = jnp.take(table, idxC, axis=0)           # compact gather
        rows = rows * 1.0001 + 0.1                     # stand-in math
        return jnp.zeros((n + 1, F)).at[idxC].set(rows)  # scatter back

    t = bench(roundtrip)
    print(f"# compact gather+scatter C={C}, F={F}: {t*1e3:7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
