"""End-to-end forward frame timing for persistent-renderer A/B runs.

Renders the flagship config (bench.py's fwd rung: 1280x720, spp 4,
depth 8, ~2M tris, tent) once for compile and once timed, printing rays/s.
Knobs come from the environment so one process = one config:

  M3T_DROP_SCAN   t-stack culled-pop scan depth (0 = round-2 behavior)
  M3T_IDLE_SPREAD idle lanes gather spread rows (1) vs shared dummy (0)
  AB_LANES / AB_STEPS / AB_RPL  lane count / steps / rounds per launch

Usage: python scripts/persistent_ab.py
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba3_experiments_tpu.integrators.persistent import (  # noqa: E402
    DROP_SCAN,
    IDLE_SPREAD,
    render_persistent,
)
from mitsuba3_experiments_tpu.scene.flagship import load_flagship  # noqa: E402

lanes = int(os.environ.get("AB_LANES", "65536"))
steps = int(os.environ.get("AB_STEPS", "24"))
rpl = int(os.environ.get("AB_RPL", "32"))

print(f"device: {jax.devices()[0]}  drop_scan={DROP_SCAN} "
      f"idle_spread={IDLE_SPREAD} lanes={lanes} steps={steps} rpl={rpl}",
      flush=True)
scene = load_flagship(res=(1280, 720), spp=4, tri_budget=2_000_000)[0]
n_rays = 1280 * 720 * 4

kw = dict(spp=4, max_depth=8, rr_depth=4, rfilter="tent", n_lanes=lanes,
          steps=steps, rounds_per_launch=rpl)
img = render_persistent(scene, seed=0, **kw)
jax.block_until_ready(img)
print("# compile done", flush=True)
t0 = time.perf_counter()
img = render_persistent(scene, seed=1, **kw)
jax.block_until_ready(img)
dt = time.perf_counter() - t0
print(f"RESULT {n_rays/dt:.0f} rays/s  ({dt:.2f} s, mean {float(img.mean()):.4f})",
      flush=True)
