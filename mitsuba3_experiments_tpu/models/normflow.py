"""RealNVP normalizing flows: affine coupling + permutation layers, NLL
training against analytic (double spiral) or image-based 2-D targets.

TPU-native re-design of /root/reference/normflow.py:
  CouplingLayer.forward/inverse (:452-564) -> `coupling_forward/_inverse`
  PermutationLayer                          -> fixed index permutation
  GELU module (:274-302)                    -> jax.nn.gelu
  TwoAlign (:331-352)                       -> unnecessary (XLA pads for the
                                               MXU automatically)
  square_to_std_normal base dist (:73-87)   -> core.warp.square_to_std_normal
  SpiralDistr (:122-150)                    -> `spiral_sample`
  ImageDistr (:162-218)                     -> DiscreteDistribution2D sampling
  training loop (:782-816)                  -> optax.adam NLL steps (bf16
                                               matmuls, no GradScaler needed)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import math as m
from ..core.distributions import DiscreteDistribution2D
from ..core.rng import Sampler
from .mlp import apply_mlp, init_mlp


# ---------------------------------------------------------------------------
# target distributions
# ---------------------------------------------------------------------------

def spiral_sample(key, n, noise=0.1):
    """Double spiral in [0,1]^2 (normflow.py:122-150)."""
    k1, k2, k3 = jax.random.split(key, 3)
    t = jnp.sqrt(jax.random.uniform(k1, (n,))) * 3.0 * jnp.pi
    branch = jax.random.bernoulli(k2, 0.5, (n,))
    sign = jnp.where(branch, 1.0, -1.0)
    r = t / (3.0 * jnp.pi) * 0.45
    x = jnp.stack([r * jnp.cos(t) * sign, r * jnp.sin(t) * sign], axis=-1)
    x = x + jax.random.normal(k3, (n, 2)) * noise * r[:, None]
    return x * 0.9 + 0.5


class ImageDistr:
    """Sample 2-D points ~ image luminance (normflow.py:162-218)."""

    def __init__(self, image):
        img = jnp.asarray(np.asarray(image, np.float32))
        if img.ndim == 3:
            img = m.luminance(img)
        self.h, self.w = img.shape
        self.dist = DiscreteDistribution2D.create(img)

    def sample(self, sampler: Sampler):
        sampler, u = sampler.next_2d()
        x, y, _ = self.dist.sample(u)
        sampler, jitter = sampler.next_2d()
        pts = jnp.stack(
            [
                (x.astype(jnp.float32) + jitter[..., 0]) / self.w,
                (y.astype(jnp.float32) + jitter[..., 1]) / self.h,
            ],
            axis=-1,
        )
        return sampler, pts


# ---------------------------------------------------------------------------
# flow layers
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FlowConfig:
    dim: int = 2
    n_couplings: int = 6
    hidden: int = 64
    net_depth: int = 2


def init_flow(key, cfg: FlowConfig):
    """Alternating-mask affine couplings; each has a scale/shift MLP."""
    params = []
    half = cfg.dim - cfg.dim // 2
    for i in range(cfg.n_couplings):
        key, k = jax.random.split(key)
        cin = half if i % 2 == 0 else cfg.dim // 2
        cout = (cfg.dim - cin) * 2  # scale + shift for the other half
        sizes = [cin] + [cfg.hidden] * cfg.net_depth + [cout]
        params.append(init_mlp(k, sizes, scale=1e-2))
    return params


def _split(x, parity, dim):
    half = dim - dim // 2
    if parity == 0:
        return x[..., :half], x[..., half:]
    return x[..., half:], x[..., :half]


def _join(a, b, parity, dim):
    if parity == 0:
        return jnp.concatenate([a, b], axis=-1)
    return jnp.concatenate([b, a], axis=-1)


def _scale_shift(net, cond, n_out):
    h = apply_mlp(net, cond, hidden_act="gelu").astype(jnp.float32)
    log_s, t = h[..., :n_out], h[..., n_out:]
    log_s = jnp.tanh(log_s) * 4.0  # bounded scales keep the flow invertible
    return log_s, t


def flow_forward(params, cfg: FlowConfig, z):
    """base -> target; returns (x, log_det)."""
    ldj = jnp.zeros(z.shape[:-1], jnp.float32)
    x = z
    for i, net in enumerate(params):
        parity = i % 2
        cond, rest = _split(x, parity, cfg.dim)
        log_s, t = _scale_shift(net, cond, rest.shape[-1])
        rest = rest * jnp.exp(log_s) + t
        ldj = ldj + jnp.sum(log_s, axis=-1)
        x = _join(cond, rest, parity, cfg.dim)
    return x, ldj


def flow_inverse(params, cfg: FlowConfig, x):
    """target -> base; returns (z, log_det of inverse)."""
    ldj = jnp.zeros(x.shape[:-1], jnp.float32)
    for i in reversed(range(len(params))):
        net = params[i]
        parity = i % 2
        cond, rest = _split(x, parity, cfg.dim)
        log_s, t = _scale_shift(net, cond, rest.shape[-1])
        rest = (rest - t) * jnp.exp(-log_s)
        ldj = ldj - jnp.sum(log_s, axis=-1)
        x = _join(cond, rest, parity, cfg.dim)
    return x, ldj


def _base_logpdf(z):
    return jnp.sum(-0.5 * z * z - 0.5 * jnp.log(2 * jnp.pi), axis=-1)


def flow_log_eval(params, cfg: FlowConfig, x):
    """log p(x) (normflow.py:639-662): pull back to base + log-det."""
    z, ldj = flow_inverse(params, cfg, x)
    return _base_logpdf(z) + ldj


def flow_sample(params, cfg: FlowConfig, key, n):
    z = jax.random.normal(key, (n, cfg.dim))
    x, ldj = flow_forward(params, cfg, z)
    log_p = _base_logpdf(z) - ldj
    return x, log_p


# ---------------------------------------------------------------------------
# training (normflow.py:782-816)
# ---------------------------------------------------------------------------

def make_train_step(cfg: FlowConfig, lr=1e-3):
    opt = optax.adam(lr)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            return -jnp.mean(flow_log_eval(p, cfg, batch))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return opt, step


def train_flow(target_sample_fn, cfg: FlowConfig = FlowConfig(),
               n_iters=2000, batch=1 << 12, seed=0, lr=1e-3):
    key = jax.random.PRNGKey(seed)
    key, k = jax.random.split(key)
    params = init_flow(k, cfg)
    opt, step = make_train_step(cfg, lr)
    opt_state = opt.init(params)
    losses = []
    for i in range(n_iters):
        key, k = jax.random.split(key)
        batch_x = target_sample_fn(k, batch)
        params, opt_state, loss = step(params, opt_state, batch_x)
        if (i + 1) % 100 == 0:
            losses.append(float(loss))
    return params, losses
