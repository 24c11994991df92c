"""Primary-traversal-only timing at several chunk sizes on the 2M scene."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from mitsuba3_experiments_tpu.intersect import ray_intersect
from mitsuba3_experiments_tpu.render import sensor as sensorlib
from mitsuba3_experiments_tpu.scene.flagship import load_flagship

scene, _ = load_flagship(res=(1280, 720), spp=4, tri_budget=2_000_000)
print("scene loaded", flush=True)

@jax.jit
def primary(scene, o, d):
    from mitsuba3_experiments_tpu.core.records import Ray
    return ray_intersect(scene, Ray.make(o, d)).t

W, H = 1280, 720
for n in (32768, 131072):
    pix = jnp.arange(n, dtype=jnp.uint32)
    pos = jnp.stack([(pix % W).astype(jnp.float32)+0.5,
                     ((pix // W) % H).astype(jnp.float32)+0.5], -1)
    ray = sensorlib.sample_ray(scene.camera, pos)
    t0 = time.time()
    t = primary(scene, ray.o, ray.d); t.block_until_ready()
    print(f"n={n}: compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(3):
        t = primary(scene, ray.o, ray.d)
    t.block_until_ready()
    dt = (time.time()-t0)/3
    print(f"n={n}: per-traversal {dt*1e3:.0f} ms -> {n/dt/1e6:.3f} Mrays/s "
          f"(hit {float(jnp.mean(jnp.isfinite(t))):.2f})", flush=True)
