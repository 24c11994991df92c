"""Normalizing-flow training driver — /root/reference/normflow.py:782-816
analog: RealNVP flow on the double spiral (or an image target), NLL descent,
density/sample visualization dumped as PNG.

Usage: python examples/train_normflow.py [iters] [target={spiral,image}]
                                         [coupling={rqs,affine}]

Coupling default is "rqs" (neural-spline): on the spiral it reaches the
affine flow's 10k-iteration NLL in ~1.2k iterations (BENCH.md) — the
measured fix for RealNVP's soft-arm limitation.  Pass "affine" for the
reference-parity RealNVP family.
"""
import sys

import _common  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba3_experiments_tpu.core.rng import Sampler
from mitsuba3_experiments_tpu.models import normflow as nf
from mitsuba3_experiments_tpu.utils import write_png

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
target = sys.argv[2] if len(sys.argv) > 2 else "spiral"
coupling = sys.argv[3] if len(sys.argv) > 3 else "rqs"

cfg = nf.FlowConfig(n_couplings=6, hidden=64, coupling=coupling)

if target == "spiral":
    sample_fn = nf.spiral_sample
else:
    # image target: procedural checker "albert" stand-in (the reference's
    # data/albert.jpg ships as an LFS pointer only)
    img = np.zeros((64, 64), np.float32)
    yy, xx = np.mgrid[0:64, 0:64]
    img[((xx // 8 + yy // 8) % 2 == 0) & (((xx - 32) ** 2 + (yy - 32) ** 2) < 900)] = 1.0
    distr = nf.ImageDistr(img)

    def sample_fn(key, n):
        # fold the PRNG key into the counter-based sampler seed on device:
        # an int() round-trip per iteration costs ~50 ms through the axon
        # tunnel (BENCH.md dispatch measurement) and would dominate the run
        s = Sampler.create(key[0] ^ key[1], n)
        _, pts = distr.sample(s)
        return pts

lr = 3e-3 if coupling == "rqs" else 1e-3
params, losses = nf.train_flow(
    sample_fn, cfg, n_iters=iters, batch=1 << 14, lr=lr
)
print(f"NLL every 100 it: {[round(l, 3) for l in losses]}")

# density heatmap + samples
g = jnp.stack(
    jnp.meshgrid(jnp.linspace(0, 1, 128), jnp.linspace(0, 1, 128)), -1
).reshape(-1, 2)
logp = np.asarray(nf.flow_log_eval(params, cfg, g)).reshape(128, 128)
dens = np.exp(logp - logp.max())
write_png("out/normflow_density.png", np.repeat(dens[..., None], 3, -1))

xs, _ = nf.flow_sample(params, cfg, jax.random.PRNGKey(5), 1 << 14)
hist, _, _ = np.histogram2d(
    np.asarray(xs[:, 1]), np.asarray(xs[:, 0]), bins=128, range=[[0, 1], [0, 1]]
)
hist = hist / hist.max()
write_png("out/normflow_samples.png", np.repeat(hist[..., None], 3, -1))
print("wrote out/normflow_{density,samples}.png")
