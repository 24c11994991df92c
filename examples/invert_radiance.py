"""Inverse rendering demo on the path-replay differentiable renderer:
recover an emitter's radiance (and a wall albedo) from a target image by
gradient descent — the adjoint workload the reference exercises through
mi.render's backward (/root/reference/path.py:332-359), here with ZERO
traversal inside the AD graph (integrators/replay.py).

Usage: python examples/invert_radiance.py [steps] [res] [spp]
"""
import sys

import _common  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mitsuba3_experiments_tpu.integrators import PathIntegrator, render
from mitsuba3_experiments_tpu.integrators.replay import replay_render_grad
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict, update
from mitsuba3_experiments_tpu.utils import write_png

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
res = int(sys.argv[2]) if len(sys.argv) > 2 else 64
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 4

scene, _ = load_dict(cornell_box(res=res, spp=spp))
depth, rr = 5, 4
n_rays = res * res * spp

# ground truth image at the true parameters
target = jnp.asarray(render(scene, PathIntegrator(max_depth=depth), spp=spp,
                            rfilter="box"))
true_rad = np.asarray(scene.emitters.radiance)

# start from wrong parameters
params = {
    "emitters.radiance": scene.emitters.radiance * 0.25,
    "materials.base_color": jnp.clip(
        scene.materials.base_color * 0.6 + 0.2, 0.0, 1.0
    ),
}
opt = optax.adam(2e-1)
opt_state = opt.init(params)

for it in range(steps):
    scene_it = update(scene, params)
    g = replay_render_grad(
        scene_it, params, update, target, seed=it + 1, idx0=0, n=n_rays,
        spp=spp, max_depth=depth, rr_depth=rr, rfilter="box",
        steps=8, rounds_per_launch=8,
    )
    updates, opt_state = opt.update(g, opt_state)
    params = jax.tree_util.tree_map(
        lambda p, u: jnp.clip(p + u, 0.0, None), params, updates
    )
    if it % 5 == 0 or it == steps - 1:
        err = float(jnp.abs(
            params["emitters.radiance"] - scene.emitters.radiance
        ).max() / jnp.abs(scene.emitters.radiance).max())
        print(f"step {it}: emitter rel err {err:.3f}", flush=True)

final = np.asarray(
    render(update(scene, params), PathIntegrator(max_depth=depth), spp=spp)
)
write_png("out/invert_final.png", final)
rec = np.asarray(params["emitters.radiance"])
print("true radiance rows:", true_rad[true_rad.sum(-1) > 0][:2].tolist())
print("recovered:", rec[true_rad.sum(-1) > 0][:2].tolist())
