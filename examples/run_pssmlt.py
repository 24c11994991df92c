"""PSSMLT vs path-tracer comparison — /root/reference/testpssmlt.py analog:
render with the PSSMLT chain integrator and the plain path tracer, write both
plus a difference image.

Usage: python examples/run_pssmlt.py [res] [iterations]
"""
import sys

import _common  # noqa: F401
import numpy as np

from mitsuba3_experiments_tpu.integrators import (
    PathIntegrator,
    Pssmlt,
    render,
)
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict
from mitsuba3_experiments_tpu.utils import mse, write_png

res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200

scene, _ = load_dict(cornell_box(res=res, spp=1))
ref = np.asarray(render(scene, PathIntegrator(max_depth=8, rr_depth=4), spp=128))

integ = Pssmlt(max_depth=8, rr_depth=4)
img = np.asarray(integ.render(scene, seed=0, n_iterations=iters))

print(f"MSE pssmlt vs path: {mse(img, ref):.4e}")
write_png("out/pssmlt.png", img)
write_png("out/pssmlt_ref.png", ref)
write_png("out/pssmlt_diff.png", np.abs(img - ref))
print("wrote out/pssmlt*.png")
