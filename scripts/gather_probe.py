"""Row-gather microprobe for the persistent stepper's cost model (v2).

v1 used `take(t, i).sum()`, which XLA can rewrite away (sum of gathered
rows == occurrence-count-weighted table sum) and let the host loop overlap
dispatches — it reported an impossible 1.35 TB/s.  v2 forces the stepper's
real regime: a DEPENDENT chain of K gathers (each step's indices derive
from the previous step's fetched row, like BVH traversal), with per-lane
use of the row so no reduction rewrite applies.  Reports ms per chain step.

Questions this answers for round-3 optimization:
  * cost per dependent gather step vs lane count (32k vs 65k vs 131k);
  * duplicate-index (all-same) vs random vs sorted locality;
  * row width 24 vs 88 floats.

Usage: python scripts/gather_probe.py
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

rows = 300_000
K = 32
print("device:", jax.devices()[0], flush=True)

rng = np.random.default_rng(0)
table88 = jnp.asarray(rng.standard_normal((rows, 88), np.float32))
table24 = jnp.asarray(np.ascontiguousarray(np.asarray(table88)[:, :24]))


@partial(jax.jit, static_argnames=("k", "mode"))
def chain(t, i0, k: int, mode: str):
    nrows = t.shape[0]

    def body(_, carry):
        i, acc = carry
        row = jnp.take(t, i, axis=0)
        acc = acc + row[:, 3]
        # next index derives from fetched data (dependent, un-rewritable)
        nxt = jax.lax.bitcast_convert_type(row[:, 0] + acc, jnp.int32)
        if mode == "same":
            nxt = jnp.zeros_like(i) + (nxt & 0)  # keep dependence, index 0
        elif mode == "local":
            nxt = (nxt & 0xFFF) % nrows
        else:
            nxt = ((nxt & 0x7FFFFFFF) % nrows)
        return nxt, acc

    i, acc = jax.lax.fori_loop(
        0, k, body, (i0, jnp.zeros(i0.shape, jnp.float32))
    )
    return acc


def timeit(label, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {dt/K:.4f} ms/step  ({dt:.2f} ms / {K} steps)",
          flush=True)
    return dt


for n in (32768, 65536, 131072):
    i0 = jnp.asarray(rng.integers(0, rows, n).astype(np.int32))
    timeit(f"dep-chain 88f x{n} random", chain, table88, i0, K, "rand")
for n in (65536,):
    i0 = jnp.asarray(rng.integers(0, rows, n).astype(np.int32))
    timeit(f"dep-chain 88f x{n} all-same", chain, table88, i0, K, "same")
    timeit(f"dep-chain 88f x{n} local-4k", chain, table88, i0, K, "local")
    timeit(f"dep-chain 24f x{n} random", chain, table24, i0, K, "rand")
