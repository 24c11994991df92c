"""Parametric BVH layout (scene/bvh8.py: M3T_BVH_WIDTH / M3T_LEAF_CAP).

The node/leaf row layouts derive from import-time constants, so non-default
settings are exercised in a subprocess with the env var set.  Each run
checks BVH traversal against the brute-force oracle on a multi-object
scene — the same invariant the in-process suite pins for the default
(WIDTH=8, LEAF_CAP=8) layout.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHECK = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from mitsuba3_experiments_tpu.core.records import Ray
from mitsuba3_experiments_tpu.intersect.bvh_jax import (
    ray_intersect, ray_intersect_brute,
)
from mitsuba3_experiments_tpu.scene import bvh8, cornell_box, load_dict

w = int(__import__("os").environ.get("M3T_BVH_WIDTH", "8"))
c = int(__import__("os").environ.get("M3T_LEAF_CAP", "8"))
assert bvh8.WIDTH == w and bvh8.LEAF_CAP == c, (bvh8.WIDTH, bvh8.LEAF_CAP)

scene, _ = load_dict(cornell_box(res=16, spp=1))
rng = np.random.default_rng(5)
n = 2048
o = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
import jax.numpy as jnp
ray = Ray.make(jnp.asarray(o), jnp.asarray(d))
si = ray_intersect(scene, ray)
sb = ray_intersect_brute(scene, ray)
np.testing.assert_array_equal(
    np.asarray(si.prim_idx), np.asarray(sb.prim_idx)
)
np.testing.assert_allclose(
    np.asarray(si.t), np.asarray(sb.t), rtol=1e-5, atol=1e-5
)
print("LAYOUT_OK", w, c)
"""


@pytest.mark.slow
@pytest.mark.parametrize(
    "env",
    [
        {"M3T_BVH_WIDTH": "16"},
        {"M3T_LEAF_CAP": "16"},
        {"M3T_BVH_WIDTH": "16", "M3T_LEAF_CAP": "16"},
        # object-split-only build (spatial splits disabled)
        {"M3T_SBVH": "0"},
        # aggressive spatial splitting: near-zero overlap threshold forces
        # many duplicated references through the oracle equality
        {"M3T_SBVH": "1", "M3T_SBVH_ALPHA": "1e-9"},
        # SA-greedy collapse on the SBVH tree
        {"M3T_COLLAPSE": "area"},
    ],
    ids=lambda e: "+".join(f"{k.split('_')[-1]}{v}" for k, v in e.items()),
)
def test_nondefault_layout_matches_brute_force(env):
    r = subprocess.run(
        [sys.executable, "-c", CHECK],
        env={**os.environ, **env, "PYTHONPATH": REPO},
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "LAYOUT_OK" in r.stdout
