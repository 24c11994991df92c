"""Per-launch timing of the cached bench program (no recompile)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from mitsuba3_experiments_tpu.integrators import PathIntegrator, render_pass
from mitsuba3_experiments_tpu.render import film as filmlib
from mitsuba3_experiments_tpu.scene.flagship import load_flagship

w, h, depth, tris, chunk = 1280, 720, 8, 2_000_000, 32768
scene, _ = load_flagship(res=(w, h), spp=4, tri_budget=tris)
print("scene loaded", flush=True)
integ = PathIntegrator(max_depth=depth, rr_depth=4)
film = filmlib.new_film(w, h)
t0 = time.time()
film = render_pass(scene, integ, jnp.uint32(0), jnp.uint32(0), film,
                   spp_per_pass=1, rfilter="tent", chunk=chunk,
                   lane_offset=jnp.uint32(0))
film.block_until_ready()
print(f"first call (cached compile?): {time.time()-t0:.1f}s", flush=True)
for k in range(6):
    t0 = time.time()
    film = render_pass(scene, integ, jnp.uint32(1), jnp.uint32(k), film,
                       spp_per_pass=1, rfilter="tent", chunk=chunk,
                       lane_offset=jnp.uint32(k * chunk))
    film.block_until_ready()
    print(f"launch {k}: {time.time()-t0:.2f}s", flush=True)
