"""Reparameterized-sampling training driver — /root/reference/reparam.ipynb
cell 21 analog at reference scale: learn the sampling map T(z) whose
pushforward density |det J_T|^-1 matches a 2-D image target by NLL descent,
then visualize the warped distribution before/after.

The reference trains its hand-rolled JacobianNet for 200k iterations
against data/albert.jpg (shipped as an LFS pointer only); here the map is
models/reparam.py (jacfwd det-J — the whole manual-backprop apparatus
collapses) trained against (a) the procedural checker-disc image stand-in
(the same one examples/train_normflow.py uses) and (b) a double-spiral
density image, long enough to visibly warp the uniform base into the
target.

Usage: python examples/train_reparam.py [iters] [target={checker,spiral}]
Artifacts: artifacts/reparam_<target>_{target,before,after}.png + metrics.
"""
import json
import os
import sys
import time

import _common  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba3_experiments_tpu.models import normflow as nf
from mitsuba3_experiments_tpu.models import reparam as rp
from mitsuba3_experiments_tpu.utils import write_png

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
target = sys.argv[2] if len(sys.argv) > 2 else "checker"

RES = 64
if target == "checker":
    img = np.zeros((RES, RES), np.float32)
    yy, xx = np.mgrid[0:RES, 0:RES]
    img[((xx // 8 + yy // 8) % 2 == 0)
        & (((xx - 32) ** 2 + (yy - 32) ** 2) < 900)] = 1.0
else:
    # density image of the double spiral (normflow.py:122-150 target)
    pts = np.asarray(nf.spiral_sample(jax.random.PRNGKey(0), 1 << 20))
    img, _, _ = np.histogram2d(
        pts[:, 1], pts[:, 0], bins=RES, range=[[0, 1], [0, 1]]
    )
    img = (img / img.max()).astype(np.float32)

# normalized density on [0,1]^2 (mean 1) with a floor so log is finite
dens = img / max(img.mean(), 1e-9)
dens_j = jnp.asarray(np.maximum(dens, 1e-4))


def log_p_ref(x):
    """log target density via bilinear lookup; ~0 outside the unit square."""
    gx = jnp.clip(x[..., 0], 0.0, 1.0) * (RES - 1)
    gy = jnp.clip(x[..., 1], 0.0, 1.0) * (RES - 1)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, RES - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, RES - 2)
    fx, fy = gx - x0, gy - y0
    d = (
        dens_j[y0, x0] * (1 - fx) * (1 - fy)
        + dens_j[y0, x0 + 1] * fx * (1 - fy)
        + dens_j[y0 + 1, x0] * (1 - fx) * fy
        + dens_j[y0 + 1, x0 + 1] * fx * fy
    )
    inside = (
        (x[..., 0] >= 0.0) & (x[..., 0] <= 1.0)
        & (x[..., 1] >= 0.0) & (x[..., 1] <= 1.0)
    )
    return jnp.log(jnp.where(inside, d, 1e-4))


def sample_hist(params, n=1 << 20, bins=128):
    """Histogram of T(z), z ~ U[0,1]^2 — the warped sampler's density."""
    z = jax.random.uniform(jax.random.PRNGKey(9), (n, 2))
    x = np.asarray(rp.apply_map(params, z, squash=True))
    hist, _, _ = np.histogram2d(
        x[:, 1], x[:, 0], bins=bins, range=[[0, 1], [0, 1]]
    )
    return hist / max(hist.max(), 1e-9)


def dump(name, a):
    write_png(name, np.repeat(np.asarray(a, np.float32)[..., None], 3, -1))


cfg = rp.ReparamConfig(dim=2, hidden=64, depth=4, squash=True,
                       fold_penalty=25.0)
params0 = rp.init_map(jax.random.PRNGKey(1), cfg)

os.makedirs("artifacts", exist_ok=True)
dump(f"artifacts/reparam_{target}_target.png", img / max(img.max(), 1e-9))
dump(f"artifacts/reparam_{target}_before.png", sample_hist(params0))

t0 = time.time()
params, losses = rp.train_reparam(
    log_p_ref, cfg, n_iters=iters, batch=1 << 14, lr=2e-3, seed=1
)
dt = time.time() - t0
print(f"{iters} iters in {dt:.1f}s; NLL every 100: first={losses[0]:.4f} "
      f"last={losses[-1]:.4f}")

dump(f"artifacts/reparam_{target}_after.png", sample_hist(params))

with open(f"artifacts/reparam_{target}_metrics.json", "w") as f:
    json.dump(
        {
            "target": target, "iters": iters, "train_s": dt,
            "nll_first100": losses[0], "nll_final": losses[-1],
            "nll_every_100": losses[:: max(1, len(losses) // 40)],
            "device": str(jax.devices()[0]),
        },
        f, indent=1,
    )
print(f"wrote artifacts/reparam_{target}_{{target,before,after}}.png")
