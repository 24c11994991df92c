"""Film / ImageBlock: scatter-add sample splatting with reconstruction
filters, and develop (weight division).

Replaces mi.ImageBlock.put + film.develop (/root/reference/pssmlt.py:164-165,
mlt.py:39,72-77).  The block is an (H, W, 4) accumulation image (RGB +
filter weight); `put` lowers to XLA's deterministic scatter-add — the film is
a pytree value threaded functionally, so it shards per-device and merges with
a psum (parallel/)."""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m


def new_film(width: int, height: int):
    return jnp.zeros((height, width, 4), m.Float)


def _accum(film, xi, yi, w, value, active):
    h, wdt, _ = film.shape
    inb = (xi >= 0) & (xi < wdt) & (yi >= 0) & (yi < h) & active
    w = jnp.where(inb, w, 0.0)
    flat = jnp.where(inb, yi * wdt + xi, 0)
    contrib = jnp.concatenate(
        [value * w[:, None], w[:, None]], axis=-1
    )
    return film.reshape(-1, 4).at[flat].add(
        jnp.where(inb[:, None], contrib, 0.0)
    ).reshape(film.shape)


def _accum_taps(film, taps, value, active):
    """One scatter-add for ALL filter taps: scatters on this TPU are
    latency-bound and (within the footprint sizes here) near-independent of
    row count, so K taps x N lanes as ONE (K*N)-row scatter costs ~1 tap's
    latency instead of K (measured: retire 5.4 -> dominated by 4 tent
    scatters before this change; see BENCH.md round-2 profile)."""
    k = len(taps)
    xi = jnp.concatenate([t[0] for t in taps])
    yi = jnp.concatenate([t[1] for t in taps])
    w = jnp.concatenate([t[2] for t in taps])
    return _accum(
        film, xi, yi, w,
        jnp.tile(value, (k, 1)), jnp.tile(active, k),
    )


def put(film, pos, value, active=None, rfilter: str = "box"):
    """Splat values at continuous film positions.

    rfilter: 'box' (1 tap) or 'tent' (2x2 taps, radius-1 triangle — the
    bedroom scene's filter, data/bedroom/scene.xml)."""
    n = pos.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    if rfilter == "box":
        xi = jnp.floor(pos[..., 0]).astype(jnp.int32)
        yi = jnp.floor(pos[..., 1]).astype(jnp.int32)
        return _accum(film, xi, yi, jnp.ones((n,), m.Float), value, active)
    elif rfilter == "gaussian":
        # mitsuba's gaussian rfilter: sigma=0.5, radius 2 -> 4x4 taps,
        # truncated (weight offset so it reaches 0 at the radius)
        import numpy as np

        sigma = 0.5
        radius = 2.0
        alpha = -1.0 / (2.0 * sigma * sigma)
        offset = float(np.exp(alpha * radius * radius))
        px = pos[..., 0] - 0.5
        py = pos[..., 1] - 0.5
        x0 = jnp.floor(px - radius + 1).astype(jnp.int32)
        y0 = jnp.floor(py - radius + 1).astype(jnp.int32)
        taps = []
        for dx in range(4):
            for dy in range(4):
                xi = x0 + dx
                yi = y0 + dy
                ddx = xi.astype(m.Float) - px
                ddy = yi.astype(m.Float) - py
                wx = jnp.maximum(jnp.exp(alpha * ddx * ddx) - offset, 0.0)
                wy = jnp.maximum(jnp.exp(alpha * ddy * ddy) - offset, 0.0)
                taps.append((xi, yi, wx * wy))
        return _accum_taps(film, taps, value, active)
    elif rfilter == "tent":
        # sample position relative to pixel centers at (i+0.5)
        px = pos[..., 0] - 0.5
        py = pos[..., 1] - 0.5
        x0 = jnp.floor(px).astype(jnp.int32)
        y0 = jnp.floor(py).astype(jnp.int32)
        fx = px - x0
        fy = py - y0
        taps = []
        for dx in (0, 1):
            for dy in (0, 1):
                wx = jnp.where(dx == 0, 1.0 - fx, fx)
                wy = jnp.where(dy == 0, 1.0 - fy, fy)
                taps.append((x0 + dx, y0 + dy, wx * wy))
        return _accum_taps(film, taps, value, active)
    else:
        raise ValueError(f"unknown rfilter {rfilter}")


def develop(film):
    """RGB / accumulated filter weight (mi.Film.develop)."""
    w = film[..., 3:4]
    return m.safe_div(film[..., :3], jnp.maximum(w, 0.0) + (w <= 0.0))
