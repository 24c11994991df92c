"""Differentiable parameter traversal — the mi.traverse analog.

The reference updates scene parameters through `mi.traverse(scene)` dict views
(/root/reference/test-restir-dynamic.py:23-29, restirgi.py:229).  Here the
scene IS a pytree, so "traverse" is just selecting the differentiable leaves
into a flat dict and "update" is functional replacement — gradients flow by
passing the params dict into the jitted render and differentiating wrt it.
"""
from __future__ import annotations

import dataclasses

import jax

from .types import Scene

# keys exposed for differentiation / scripted updates
PARAM_KEYS = {
    "materials.base_color": lambda s: s.materials.base_color,
    "materials.params": lambda s: s.materials.params,
    "emitters.radiance": lambda s: s.emitters.radiance,
    "camera.to_world": lambda s: s.camera.to_world,
    "textures.data": lambda s: s.textures.data,
}


def traverse(scene: Scene) -> dict:
    """Extract the differentiable parameter dict from a compiled scene."""
    return {k: f(scene) for k, f in PARAM_KEYS.items()}


def update(scene: Scene, params: dict) -> Scene:
    """Write a (possibly modified) parameter dict back into the scene."""
    s = scene
    if "materials.base_color" in params or "materials.params" in params:
        s = dataclasses.replace(
            s,
            materials=dataclasses.replace(
                s.materials,
                base_color=params.get(
                    "materials.base_color", s.materials.base_color
                ),
                params=params.get("materials.params", s.materials.params),
            ),
        )
    if "emitters.radiance" in params:
        s = dataclasses.replace(
            s,
            emitters=dataclasses.replace(
                s.emitters, radiance=params["emitters.radiance"]
            ),
        )
    if "camera.to_world" in params:
        s = dataclasses.replace(
            s,
            camera=dataclasses.replace(
                s.camera, to_world=params["camera.to_world"]
            ),
        )
    if "textures.data" in params:
        s = dataclasses.replace(
            s, textures=dataclasses.replace(s.textures, data=params["textures.data"])
        )
    return s
