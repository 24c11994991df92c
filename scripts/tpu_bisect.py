"""Bisect the TPU device fault: same traversal program, increasing tree size."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from mitsuba3_experiments_tpu.core.records import Ray
from mitsuba3_experiments_tpu.intersect import ray_intersect
from mitsuba3_experiments_tpu.render import sensor as sensorlib
from mitsuba3_experiments_tpu.scene.flagship import load_flagship

W, H = 160, 90
n = W * H

for tris in (50_000, 100_000, 150_000, 200_000):
    t0 = time.time()
    scene, _ = load_flagship(res=(W, H), spp=1, tri_budget=tris)
    pix = jnp.arange(n, dtype=jnp.uint32)
    pos = jnp.stack(
        [(pix % W).astype(jnp.float32) + 0.5, (pix // W).astype(jnp.float32) + 0.5],
        axis=-1,
    )
    ray = sensorlib.sample_ray(scene.camera, pos)

    @jax.jit
    def primary(scene, ray):
        return ray_intersect(scene, ray).t

    try:
        t1 = time.time()
        t = primary(scene, ray)
        t.block_until_ready()
        tc = time.time() - t1
        t2 = time.time()
        for _ in range(3):
            t = primary(scene, ray)
            t.block_until_ready()
        dt = (time.time() - t2) / 3
        print(
            f"tris={tris}: faces={scene.n_faces} nodes={scene.bvh.nodes.shape[0]} "
            f"compile+run={tc:.1f}s run={dt*1e3:.1f}ms "
            f"hit={float(jnp.mean(jnp.isfinite(t))):.2f}",
            flush=True,
        )
    except Exception as e:
        print(f"tris={tris}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        break
