"""Hardware verification of the Pallas blocked prefix-sum (VERDICT r1 weak #3:
"the Pallas prefix-sum is tested only in interpret mode").  Runs the kernel on
the real chip, asserts equality vs jnp.cumsum, and times both at several sizes.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/pallas_hw_check.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba3_experiments_tpu import ops

dev = jax.devices()[0]
print("device:", dev)

rng = np.random.default_rng(7)
for n in (1 << 14, 1 << 18, 1 << 22):
    x = jnp.asarray(rng.random(n, dtype=np.float32))
    ref = jnp.cumsum(x)
    got = ops.prefix_sum_pallas(x, block=2048)
    err = float(jnp.max(jnp.abs(got - ref)) / (float(jnp.max(jnp.abs(ref))) + 1e-9))
    print(f"n={n}: max rel err vs cumsum = {err:.3e}")
    assert err < 1e-5, err

    # timing (best of 5 after warmup)
    f_ref = jax.jit(lambda v: jnp.cumsum(v))
    f_pal = jax.jit(lambda v: ops.prefix_sum_pallas(v, block=2048))
    for name, f in (("xla cumsum", f_ref), ("pallas scan", f_pal)):
        f(x).block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            f(x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        print(f"  {name:12s}: {min(ts)*1e3:.3f} ms")
print("PALLAS_HW_CHECK_OK")
