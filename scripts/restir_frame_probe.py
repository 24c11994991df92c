"""Time one chunked ReSTIR frame on the TPU to size the reference-scale
A/B run (VERDICT r1 #9).

Usage: python scripts/restir_frame_probe.py [res] [chunk] [frames]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from mitsuba3_experiments_tpu.integrators.restir import RestirGI
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict

res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
frames = int(sys.argv[3]) if len(sys.argv) > 3 else 3

print("device:", jax.devices()[0], flush=True)
scene, _ = load_dict(cornell_box(res=res, spp=1))
integ = RestirGI(max_depth=8, rr_depth=2)
state = integ.init_state(scene)

for i in range(frames):
    t0 = time.perf_counter()
    img, state = integ.render_frame_chunked(
        scene, state, jnp.uint32(i), chunk=chunk
    )
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    print(f"frame {i}: {dt:.1f}s mean={float(np.asarray(img).mean()):.4f}",
          flush=True)
