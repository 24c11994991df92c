"""Path-tracer comparison driver — the /root/reference/path.py:307-359
__main__ analog: render the cornell box with the MIS tracer and the simple
(BSDF-only) tracer, print MSE + compiled-program cost analysis (the
kernel-history replacement), write EXR/PNG outputs.

Usage: python examples/render_path.py [res] [spp]   (EX_CPU=1 to force CPU)
"""
import sys

import _common  # noqa: F401
import numpy as np

from mitsuba3_experiments_tpu.integrators import (
    PathIntegrator,
    SimpleIntegrator,
    render,
)
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict
from mitsuba3_experiments_tpu.utils import kernel_history, mse, write_exr, write_png

res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 256

scene, meta = load_dict(cornell_box(res=res, spp=spp))
max_depth, rr_depth = 8, 4

img_mis = np.asarray(
    render(scene, PathIntegrator(max_depth=max_depth, rr_depth=rr_depth), spp=spp)
)
img_simple = np.asarray(
    render(scene, SimpleIntegrator(max_depth=max_depth, rr_depth=rr_depth), spp=spp)
)

print(f"MSE (mis vs simple): {mse(img_mis, img_simple):.3e}")

# kernel-history analog: compiled cost analysis of one render pass
from mitsuba3_experiments_tpu.integrators.common import render_pass
from mitsuba3_experiments_tpu.render import film as filmlib
import jax.numpy as jnp

cost = kernel_history(
    render_pass, scene, PathIntegrator(max_depth=max_depth), jnp.uint32(0),
    jnp.uint32(0), filmlib.new_film(res, res), spp_per_pass=1, rfilter="box",
)
print(
    f"cost analysis: flops={cost.get('flops', 0):.3g} "
    f"bytes={cost.get('bytes accessed', 0):.3g} "
    f"temp={cost.get('temp_size_in_bytes', 0):.3g}"
)

write_exr("out/path_mis.exr", img_mis)
write_png("out/path_mis.png", img_mis)
write_png("out/path_simple.png", img_simple)
print("wrote out/path_mis.{exr,png}, out/path_simple.png")
