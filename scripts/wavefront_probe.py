"""Probe for the round-2 wavefront redesign: cost of full-wave sort/reorder,
chunked dynamic-slice state updates, and host syncs on the axon TPU.

Answers (BENCH.md round-2 agenda #1):
  1. compile + run time of argsort(key) + pytree gather-reorder at wave sizes
     128k / 256k / 920k lanes  (can we afford a per-bounce global ray sort?)
  2. cost of a chunk-windowed state update (dynamic_slice -> compute ->
     dynamic_update_slice on donated wave arrays)  (the per-chunk bounce
     kernel shell)
  3. device->host sync of n_alive per bounce
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np


def timed(label, fn, *args, donate=False, iters=3):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    c = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    r = (time.time() - t0) / iters
    print(f"{label}: compile+run {c:.1f}s  run {r * 1e3:.2f} ms", flush=True)
    return out


def make_state(rng, n):
    f32 = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    return {
        "ray_o": f32(n, 3),
        "ray_d": f32(n, 3),
        "f": f32(n, 3),
        "L": f32(n, 3),
        "pos": f32(n, 2),
        "eta": f32(n),
        "prev_pdf": f32(n),
        "lane": jnp.arange(n, dtype=jnp.uint32),
        "flags": jnp.zeros((n,), jnp.uint32),
    }


@jax.jit
def sort_reorder(key, state):
    order = jnp.argsort(key)
    return jax.tree.map(lambda a: jnp.take(a, order, axis=0), state)


@jax.jit
def count_alive(flags):
    return jnp.sum((flags & 1).astype(jnp.int32))


CH = 32768


@partial(jax.jit, donate_argnums=(0,))
def chunk_update(state, off):
    sl = jax.tree.map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, off, CH, 0), state
    )
    sl = {k: (v * 1.0001 if v.dtype == jnp.float32 else v) for k, v in sl.items()}
    return jax.tree.map(
        lambda a, b: jax.lax.dynamic_update_slice_in_dim(a, b, off, 0),
        state, sl,
    )


rng = np.random.default_rng(0)
for N in (1 << 17, 1 << 18, 900 * 1024):
    print(f"==== wave N={N} ====", flush=True)
    key = jnp.asarray(rng.integers(0, 1 << 24, size=N).astype(np.uint32))
    state = make_state(rng, N)
    state = timed(f"sort_reorder N={N}", sort_reorder, key, state)

    t0 = time.time()
    na = int(count_alive(state["flags"]))
    print(f"count_alive compile+sync {time.time() - t0:.2f}s", flush=True)
    t0 = time.time()
    for _ in range(5):
        na = int(count_alive(state["flags"]))
    print(f"count_alive sync {(time.time() - t0) / 5 * 1e3:.2f} ms", flush=True)

    t0 = time.time()
    state = jax.block_until_ready(chunk_update(state, jnp.int32(0)))
    print(f"chunk_update compile+run {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    iters = 6
    for k in range(iters):
        state = chunk_update(state, jnp.int32((k % (N // CH)) * CH))
    jax.block_until_ready(state)
    print(
        f"chunk_update run {(time.time() - t0) / iters * 1e3:.2f} ms "
        f"({CH} lanes/launch)", flush=True,
    )
print("DONE", flush=True)
