"""A/B: Pallas per-tile traversal kernel vs the XLA lockstep while_loop.

Same rays, same BVH, same chunk sizes (VERDICT r1 #4: adopt or reject with
numbers).  Uses a VMEM-scale scene (sphere grid, ~50k tris by default).

Usage: python scripts/pallas_trav_bench.py '[{"n":32768,"tile":512}]'
"""
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

from mitsuba3_experiments_tpu.intersect.bvh_jax import _traverse
from mitsuba3_experiments_tpu.intersect.bvh_pallas import (
    pack_tables,
    traverse_pallas,
)
from mitsuba3_experiments_tpu.scene import load_dict
from mitsuba3_experiments_tpu.scene import mesh as meshlib


def make_scene(n_theta=64, n_phi=128, grid=3):
    """grid x grid spheres, ~2*n_theta*n_phi tris each."""
    d = {"type": "scene", "sensor": {"type": "perspective", "fov": 45.0}}
    for i in range(grid):
        for j in range(grid):
            sph = meshlib.sphere(radius=0.45, n_theta=n_theta, n_phi=n_phi)
            v = np.asarray(sph.vertices) + np.array(
                [i - grid / 2 + 0.5, j - grid / 2 + 0.5, 0.0], np.float32
            )
            d[f"s{i}_{j}"] = {
                "type": "mesh", "vertices": v, "faces": sph.faces,
                "normals": sph.normals, "bsdf": {"type": "diffuse"},
            }
    scene, _ = load_dict(d)
    return scene


cfgs = json.loads(sys.argv[1]) if len(sys.argv) > 1 else [
    {"n": 32768, "tile": 512},
]

print("device:", jax.devices()[0], flush=True)
scene = make_scene()
b = scene.bvh
node_tab, leaf_tab = pack_tables(b)
n_tris = int(scene.geometry.faces.shape[0])
vmem_kb = (node_tab.size + leaf_tab.size) * 4 / 1024
print(f"tris={n_tris} nodes={node_tab.shape} leaves={leaf_tab.shape} "
      f"tables={vmem_kb:.0f} KiB", flush=True)

rng = np.random.default_rng(0)
for cfg in cfgs:
    n = cfg["n"]
    o = rng.uniform(-2.2, 2.2, size=(n, 3)).astype(np.float32)
    tgt = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    maxt = jnp.full((n,), np.inf, jnp.float32)
    active = jnp.ones((n,), bool)

    res = {"cfg": cfg, "tris": n_tris}
    failed = False
    for name, fn in [
        ("xla", lambda: _traverse(
            b.unified, b.nodes.shape[0], o_j, d_j, maxt, active, False
        )),
        ("pallas", lambda: traverse_pallas(
            node_tab, leaf_tab, o_j, d_j, maxt, active,
            tile=cfg.get("tile", 512), any_hit=False,
        )),
    ]:
        t0 = time.perf_counter()
        try:
            out = jax.block_until_ready(fn())
        except Exception as e:
            res[f"{name}_error"] = str(e).splitlines()[0][:200]
            failed = True
            continue
        res[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        res[f"{name}_ms"] = round(dt * 1e3, 2)
        res[f"{name}_mrays_s"] = round(n / dt / 1e6, 3)
        res[f"{name}_hits"] = int(jnp.sum(out[1] >= 0))
    if not failed:
        res["speedup"] = round(res["xla_ms"] / res["pallas_ms"], 2)
    print(json.dumps(res), flush=True)
