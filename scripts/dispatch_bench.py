"""Measure per-launch dispatch overhead on the axon TPU tunnel.

The staged wavefront renderer issues many small launches per frame (one
bounce program per chunk per bounce).  This bench answers: what does one
round trip cost, and how well do async dispatches pipeline?
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)


@jax.jit
def tiny(x):
    return x * 1.000001 + 0.5


@jax.jit
def gathery(x, idx, table):
    # one row gather + elementwise: the shape of a cheap stage
    return x + jnp.take(table, idx, axis=0).sum(axis=-1)


def _fetch(out):
    # on the axon tunnel block_until_ready returns before remote execution
    # finishes; a host transfer is the only reliable sync
    if isinstance(out, tuple):
        out = out[0]
    import numpy as np
    return np.asarray(out.ravel()[:1])


def bench(fn, args, n_warm=3, n=50, label=""):
    for _ in range(n_warm):
        out = fn(*args)
    _fetch(out)
    # serial (fetch every launch)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        _fetch(out)
    serial = (time.perf_counter() - t0) / n
    # pipelined (fetch once at the end)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _fetch(out)
    piped = (time.perf_counter() - t0) / n
    print(f"{label}: serial {serial*1e3:.3f} ms/launch, pipelined "
          f"{piped*1e3:.3f} ms/launch", flush=True)


for n_lanes in (768, 8192, 32768):
    x = jnp.ones((n_lanes,), jnp.float32)
    bench(tiny, (x,), label=f"tiny n={n_lanes}")

table = jnp.ones((524288, 64), jnp.float32)
for n_lanes in (768, 8192, 32768, 131072):
    x = jnp.ones((n_lanes,), jnp.float32)
    idx = (jnp.arange(n_lanes, dtype=jnp.int32) * 9973) % 524288
    bench(gathery, (x, idx, table), label=f"gather(64f row) n={n_lanes}")

# chained gathers (dependent, like traversal steps): K gathers in one program
def chained(x, idx, table, K):
    def body(i, c):
        s, ix = c
        row = jnp.take(table, ix, axis=0)
        s = s + row.sum(axis=-1)
        ix = (ix + row[:, 0].astype(jnp.int32) + 1) % 524288
        return (s, ix)
    s, _ = jax.lax.fori_loop(0, K, body, (x, idx))
    return s

import functools
for K in (8, 32):
    f = jax.jit(functools.partial(chained, K=K))
    for n_lanes in (768, 8192, 32768, 131072):
        x = jnp.ones((n_lanes,), jnp.float32)
        idx = (jnp.arange(n_lanes, dtype=jnp.int32) * 9973) % 524288
        bench(f, (x, idx, table), n=20,
              label=f"chained K={K} gathers n={n_lanes}")

# sort cost: key sort + apply permutation to a 20-float state
def sortperm(keys, state):
    order = jnp.argsort(keys)
    return jnp.take(state, order, axis=0), jnp.take(keys, order)

f = jax.jit(sortperm)
for n_lanes in (32768, 131072):
    keys = (jnp.arange(n_lanes, dtype=jnp.uint32)
            * jnp.uint32(2654435761)) % jnp.uint32(1000003)
    state = jnp.ones((n_lanes, 20), jnp.float32)
    bench(f, (keys, state), n=20, label=f"argsort+perm20 n={n_lanes}")
