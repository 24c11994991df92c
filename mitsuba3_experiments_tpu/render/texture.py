"""Bitmap texture fetch with bilinear filtering — mi.Texture2f analog
(textured reflectance in the bedroom scene and
/root/reference/specular_from_bsdf.py:25-50)."""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..scene.types import TextureAtlas


def eval_texture(atlas: TextureAtlas, tex_id, uv):
    """Bilinear fetch; tex_id (N,) (-1 lanes get 1.0), uv (N, 2) with repeat
    wrap.  V axis follows image convention (v=0 -> last row) like Mitsuba."""
    tid = jnp.maximum(tex_id, 0)
    size = jnp.take(atlas.size, tid, axis=0)          # (N, 2) = (h, w)
    h = size[:, 0].astype(m.Float)
    w = size[:, 1].astype(m.Float)

    u = uv[:, 0] - jnp.floor(uv[:, 0])
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    x = u * w - 0.5
    y = (1.0 - v) * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def fetch(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), size[:, 1])
        yi = jnp.mod(yi.astype(jnp.int32), size[:, 0])
        flat = (tid * atlas.data.shape[1] + yi) * atlas.data.shape[2] + xi
        return jnp.take(
            atlas.data.reshape(-1, 3), flat, axis=0
        )

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    top = c00 * (1 - fx)[:, None] + c10 * fx[:, None]
    bot = c01 * (1 - fx)[:, None] + c11 * fx[:, None]
    out = top * (1 - fy)[:, None] + bot * fy[:, None]
    return jnp.where((tex_id >= 0)[:, None], out, 1.0)
