"""GGX (Trowbridge-Reitz) microfacet distribution with Smith shadowing —
replaces mitsuba's MicrofacetDistribution used by the rough* BSDF plugins
the bedroom scene needs (roughconductor/roughdielectric/roughplastic,
/root/reference/data/bedroom/scene.xml)."""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core import warp


def ggx_d(mh, alpha):
    """Normal distribution D(m), mh local half-vector (..., 3)."""
    c2 = m.cos2_theta(mh)
    t = c2 * (alpha * alpha - 1.0) + 1.0
    d = m.safe_div(alpha * alpha, m.PI * t * t)
    return jnp.where(mh[..., 2] > 0.0, d, 0.0)


def ggx_lambda(v, alpha):
    t2 = m.tan2_theta(v)
    t2 = jnp.where(jnp.isfinite(t2), t2, 0.0)
    return 0.5 * (-1.0 + jnp.sqrt(1.0 + alpha * alpha * t2))


def smith_g1(v, mh, alpha):
    g = 1.0 / (1.0 + ggx_lambda(v, alpha))
    # masking: v must be on the same side as the micronormal
    return jnp.where(m.dot(v, mh) * v[..., 2] > 0.0, g, 0.0)


def smith_g(wi, wo, mh, alpha):
    return smith_g1(wi, mh, alpha) * smith_g1(wo, mh, alpha)


def sample_ggx(u2, alpha):
    """Sample m ~ D(m) cos(theta_m); returns (m, pdf)."""
    mh = warp.square_to_ggx(u2, alpha)
    return mh, ggx_d(mh, alpha) * m.cos_theta(mh)


def pdf_ggx(mh, alpha):
    return ggx_d(mh, alpha) * jnp.maximum(m.cos_theta(mh), 0.0)
