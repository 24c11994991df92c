"""Launch-time vs chunk size with the wide BVH (cached 2M scene)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from mitsuba3_experiments_tpu.integrators import PathIntegrator, render_pass
from mitsuba3_experiments_tpu.render import film as filmlib
from mitsuba3_experiments_tpu.scene.flagship import load_flagship

scene, _ = load_flagship(res=(1280, 720), spp=4, tri_budget=2_000_000)
print("scene loaded", flush=True)
integ = PathIntegrator(max_depth=8, rr_depth=4)
for chunk in (32768, 131072, 460800, 921600):
    film = filmlib.new_film(1280, 720)
    t0 = time.time()
    film = render_pass(scene, integ, jnp.uint32(0), jnp.uint32(0), film,
                       spp_per_pass=1, rfilter="tent", chunk=chunk,
                       lane_offset=jnp.uint32(0))
    film.block_until_ready()
    print(f"chunk={chunk}: compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for k in range(2):
        film = render_pass(scene, integ, jnp.uint32(1), jnp.uint32(k), film,
                           spp_per_pass=1, rfilter="tent", chunk=chunk,
                           lane_offset=jnp.uint32(k*chunk % (921600 - chunk + 1)))
    film.block_until_ready()
    dt = (time.time()-t0)/2
    print(f"chunk={chunk}: launch {dt:.2f}s -> {chunk/dt:.0f} rays/s", flush=True)
