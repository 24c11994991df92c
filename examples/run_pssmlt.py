"""PSSMLT vs path-tracer comparison — /root/reference/testpssmlt.py analog:
render with the PSSMLT chain integrator and the plain path tracer, write both
plus a difference image.  `caustic` renders the hard-transport scene the
reference probes PSSMLT with (testpssmlt.py:17-49): a glass sphere focusing
a small bright light onto a diffuse floor — the regime where Markov-chain
exploration beats independent sampling.

Usage: python examples/run_pssmlt.py [res] [iterations] [cornell|caustic]
"""
import sys

import _common  # noqa: F401
import numpy as np

from mitsuba3_experiments_tpu.core import math as m
from mitsuba3_experiments_tpu.integrators import (
    PathIntegrator,
    Pssmlt,
    render,
)
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict
from mitsuba3_experiments_tpu.scene import mesh as meshlib
from mitsuba3_experiments_tpu.utils import mse, write_png

res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
which = sys.argv[3] if len(sys.argv) > 3 else "cornell"


def caustic_scene(res: int) -> dict:
    """Glass sphere over a diffuse floor, small bright area light."""
    sph = meshlib.sphere(radius=0.5, n_theta=24, n_phi=48)
    floor = meshlib.rectangle(subdiv=8)
    light = meshlib.rectangle(subdiv=1)
    fv = (floor.vertices * 4.0) @ np.array(
        [[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32
    )
    lv = light.vertices * 0.15 @ np.array(
        [[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32
    ) + np.array([1.2, 2.5, 1.2], np.float32)
    return {
        "type": "scene",
        "sensor": {
            "type": "perspective", "fov": 40.0,
            "to_world": m.look_at([0, 2.2, 4.5], [0, 0.4, 0], [0, 1, 0]),
            "film": {"width": res, "height": res},
        },
        "ball": {
            "type": "mesh",
            "vertices": sph.vertices + np.array([0, 0.8, 0], np.float32),
            "faces": sph.faces,
            "bsdf": {"type": "dielectric", "int_ior": 1.5},
        },
        "floor": {
            "type": "mesh", "vertices": fv, "faces": floor.faces,
            "bsdf": {"type": "diffuse", "reflectance": [0.6, 0.55, 0.5]},
        },
        "light": {
            "type": "mesh", "vertices": lv, "faces": light.faces,
            "bsdf": {"type": "diffuse", "reflectance": [0.0, 0.0, 0.0]},
            "emitter": {"type": "area", "radiance": [400.0, 380.0, 350.0]},
        },
    }


if which == "caustic":
    scene, _ = load_dict(caustic_scene(res))
else:
    scene, _ = load_dict(cornell_box(res=res, spp=1))
ref_spp = int(__import__("os").environ.get("PSSMLT_REF_SPP", "1024"))
ref = np.asarray(
    render(scene, PathIntegrator(max_depth=8, rr_depth=4), spp=ref_spp,
           seed=101)
)

integ = Pssmlt(max_depth=8, rr_depth=4)
img = np.asarray(integ.render(scene, seed=0, n_iterations=iters))

# EQUAL-BUDGET independent-sampling comparison (the ptracer/path pair of
# /root/reference/testpssmlt.py:17-49): one PSSMLT chain per pixel makes
# `iters - bootstrap` aggregated mutations per pixel, each one full path
# sample, so the path tracer gets exactly that many spp
eq_spp = max(2, iters - integ.bootstrap_count)
eq = np.asarray(
    render(scene, PathIntegrator(max_depth=8, rr_depth=4),
           spp=eq_spp, seed=11)
)
m_pssmlt = float(mse(img, ref))
m_path = float(mse(eq, ref))
print(f"[{which}] MSE pssmlt ({iters} mutations) vs {ref_spp}-spp ref: "
      f"{m_pssmlt:.4e}")
print(f"[{which}] MSE equal-budget path ({eq_spp} spp) vs ref: "
      f"{m_path:.4e}")
write_png(f"out/pssmlt_{which}.png", img)
write_png(f"out/pssmlt_{which}_ref.png", ref)
write_png(f"out/pssmlt_{which}_diff.png", np.abs(img - ref))

import json
import os

os.makedirs("artifacts", exist_ok=True)
out = {
    "scene": which, "res": res, "iterations": iters,
    "bootstrap": integ.bootstrap_count, "ref_spp": ref_spp,
    "equal_budget_spp": eq_spp,
    "mse_pssmlt": m_pssmlt, "mse_path_equal_budget": m_path,
    "pssmlt_vs_path": m_pssmlt / m_path if m_path > 0 else None,
}
with open(f"artifacts/pssmlt_{which}_metrics.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
print(f"wrote out/pssmlt_{which}*.png + artifacts/pssmlt_{which}_metrics.json")
