"""A/B: nerad train step with the fused Pallas MLP vs the XLA layer path.

VERDICT r1 #5 "done" criterion: train-step timing with/without recorded,
numerically-identical on hardware.

Usage: python scripts/nerad_fused_bench.py [n_iters]
"""
import dataclasses
import json
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

from mitsuba3_experiments_tpu.models.nerad import FieldConfig, NeradTrainer
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict

n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 13
m_rhs = int(sys.argv[3]) if len(sys.argv) > 3 else 16
print("device:", jax.devices()[0], flush=True)
scene, _ = load_dict(cornell_box(res=64, spp=1))

results = {}
for name, fused in [("xla", False), ("fused", True)]:
    cfg = FieldConfig(fused=fused)
    tr = NeradTrainer(field_cfg=cfg, batch_size=batch, m_rhs=m_rhs)
    init, step = tr.make_train_step(scene)
    params, opt_state = init(jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, jnp.uint32(0))
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(1, n_iters + 1):
        params, opt_state, loss = step(params, opt_state, jnp.uint32(i))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / n_iters
    results[name] = {
        "compile_s": round(compile_s, 1),
        "step_ms": round(dt * 1e3, 2),
        "final_loss": float(loss),
    }
    print(json.dumps({name: results[name]}), flush=True)

# numerical identity of the field forward on hardware
from mitsuba3_experiments_tpu.models.nerad import field_eval, init_field

cfg = FieldConfig()
cfg_f = dataclasses.replace(cfg, fused=True)
p0 = init_field(jax.random.PRNGKey(1), cfg)
x = jax.random.uniform(jax.random.PRNGKey(2), (8192, 3))
wi = jax.random.normal(jax.random.PRNGKey(3), (8192, 3))
wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
a = np.asarray(field_eval(p0, cfg, x, wi))
b = np.asarray(field_eval(p0, cfg_f, x, wi))
rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
results["forward_max_rel_diff"] = float(rel)
results["speedup"] = round(
    results["xla"]["step_ms"] / results["fused"]["step_ms"], 3
)
print(json.dumps(results), flush=True)
