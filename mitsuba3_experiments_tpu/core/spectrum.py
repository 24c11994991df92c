"""Spectrum / polarization hooks — RGB-mode parity layer.

Every reference experiment uses the `*_ad_rgb` variants except patch.py
(`cuda_ad_spectral`), so this framework is RGB-first (SURVEY.md section 2.2
"Spectral/polarization hooks": keep Spectrum = Color3f, mueller ops as
identity).  These aliases keep call sites source-compatible with a future
spectral mode.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m

is_spectral = False
is_monochromatic = False
is_polarized = False


def spectrum(value, n=None):
    """mi.Spectrum(x) analog: broadcast scalar/rgb to (..., 3)."""
    arr = jnp.asarray(value, m.Float)
    if arr.ndim == 0:
        arr = jnp.broadcast_to(arr, (3,))
    if n is not None and arr.ndim == 1:
        arr = jnp.broadcast_to(arr, (n, 3))
    return arr


def unpolarized_spectrum(s):
    """mi.unpolarized_spectrum: identity in RGB mode (path.py:71)."""
    return s


def to_world_mueller(value, wo, wi):
    """si.to_world_mueller: identity in unpolarized RGB mode
    (/root/reference/restirgi.py:546,554)."""
    return value


def spectrum_list_to_srgb(values, wavelengths=None, active=None):
    """mi.spectrum_list_to_srgb: RGB mode passthrough (path.py:85)."""
    return values


def luminance(rgb):
    return m.luminance(rgb)
