"""TPU perf probe: time BVH traversal and full render at realistic wavefronts."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", "/root/repo/.jax_cache"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from mitsuba3_experiments_tpu.core.records import Ray
from mitsuba3_experiments_tpu.integrators import PathIntegrator, render_pass
from mitsuba3_experiments_tpu.intersect import ray_intersect
from mitsuba3_experiments_tpu.intersect.bvh_jax import _traverse
from mitsuba3_experiments_tpu.render import film as filmlib
from mitsuba3_experiments_tpu.render import sensor as sensorlib
from mitsuba3_experiments_tpu.scene.flagship import load_flagship

W, H = int(os.environ.get("PW", 1280)), int(os.environ.get("PH", 720))
TRIS = int(os.environ.get("PTRIS", 200_000))
DEPTH = int(os.environ.get("PDEPTH", 4))

print(f"devices: {jax.devices()}", flush=True)
scene, meta = load_flagship(res=(W, H), spp=1, tri_budget=TRIS)
print(f"scene: {scene.n_faces} faces, {scene.bvh.left.shape[0]} nodes", flush=True)

n = W * H
pix = jnp.arange(n, dtype=jnp.uint32)
px = (pix % W).astype(jnp.float32) + 0.5
py = (pix // W).astype(jnp.float32) + 0.5
pos = jnp.stack([px, py], axis=-1)
ray = sensorlib.sample_ray(scene.camera, pos)


@jax.jit
def primary(scene, ray):
    si = ray_intersect(scene, ray)
    return si.t

t0 = time.time()
t = primary(scene, ray)
t.block_until_ready()
print(f"primary compile+run: {time.time()-t0:.2f}s", flush=True)
for _ in range(3):
    t0 = time.time()
    t = primary(scene, ray)
    t.block_until_ready()
    dt = time.time() - t0
print(f"primary intersect: {dt*1e3:.1f} ms -> {n/dt/1e6:.2f} Mrays/s "
      f"(hit rate {float(jnp.mean(jnp.isfinite(t))):.2f})", flush=True)

CHUNK = int(os.environ.get("PCHUNK", "32768"))
integ = PathIntegrator(max_depth=DEPTH, rr_depth=4)
film = filmlib.new_film(W, H)
t0 = time.time()
film = render_pass(scene, integ, jnp.uint32(0), jnp.uint32(0), film,
                   spp_per_pass=1, rfilter="tent", chunk=CHUNK,
                   lane_offset=jnp.uint32(0))
film.block_until_ready()
print(f"render compile+run (chunk {CHUNK}): {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
for off in range(0, n, CHUNK):
    film = render_pass(scene, integ, jnp.uint32(0), jnp.uint32(1), film,
                       spp_per_pass=1, rfilter="tent", chunk=CHUNK,
                       lane_offset=jnp.uint32(off))
film.block_until_ready()
dt = time.time() - t0
print(f"render pass (depth {DEPTH}, chunked): {dt*1e3:.1f} ms -> "
      f"{n/dt/1e6:.3f} Mcam-rays/s", flush=True)
