"""Microbenchmark: per-lane gather cost on the axon TPU vs table size/mode."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 1 << 17  # lanes


def bench(fn, *args, iters=5):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def gather_pib(t, i):
    """Explicit lax.gather with PROMISE_IN_BOUNDS."""
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    return lax.gather(
        t, i[:, None], dnums, slice_sizes=(1, t.shape[1]),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def onehot_gather(t, i):
    oh = jax.nn.one_hot(i, t.shape[0], dtype=t.dtype)
    return jnp.dot(oh, t, preferred_element_type=jnp.float32)


rng = np.random.default_rng(0)
for M in (1 << 12, 1 << 16, 1 << 19):
    table2 = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, size=N).astype(np.int32))

    res = {}
    res["take"] = bench(lambda t, i: jnp.take(t, i, axis=0), table2, idx)
    res["clip"] = bench(
        lambda t, i: jnp.take(t, i, axis=0, mode="clip"), table2, idx
    )
    res["idx[]"] = bench(lambda t, i: t[i], table2, idx)
    res["pib"] = bench(gather_pib, table2, idx)
    if M <= 1 << 16:
        res["onehot"] = bench(onehot_gather, table2, idx)
    print(
        f"M={M:7d}: "
        + " ".join(f"{k}={v*1e3:8.2f}ms" for k, v in res.items()),
        flush=True,
    )
