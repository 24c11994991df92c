"""Wavefront renderer parity: the staged per-bounce renderer with ray
regeneration (integrators/wavefront.py) must reproduce the lockstep
`render()` estimates ray-for-ray (same RNG dimension assignment), across
chunking and coherence-sorting configurations."""
import numpy as np
import pytest

from mitsuba3_experiments_tpu.core import math as m
from mitsuba3_experiments_tpu.integrators import PathIntegrator, render
from mitsuba3_experiments_tpu.integrators.wavefront import render_wavefront
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict
from mitsuba3_experiments_tpu.scene import mesh as meshlib


@pytest.fixture(scope="module")
def cornell():
    scene, _ = load_dict(cornell_box(res=24))
    return scene


@pytest.fixture(scope="module")
def bvh_scene():
    """Sphere + floor + area light: enough triangles to engage the BVH."""
    sph = meshlib.sphere(radius=1.0, n_theta=20, n_phi=40)
    quad = meshlib.rectangle(subdiv=4)
    light = meshlib.rectangle(subdiv=1)
    fv = (quad.vertices * 4.0) @ np.array(
        [[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32
    )
    lv = light.vertices @ np.array(
        [[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32
    ) + np.array([0, 4, 0], np.float32)
    sd = {
        "type": "scene",
        "sensor": {
            "type": "perspective", "fov": 45.0,
            "to_world": m.look_at([0, 2, 6], [0, 0.5, 0], [0, 1, 0]),
            "film": {"width": 32, "height": 24},
        },
        "sphere": {
            "type": "mesh",
            "vertices": sph.vertices + np.array([0, 1, 0], np.float32),
            "faces": sph.faces,
            "bsdf": {"type": "roughconductor", "alpha": 0.2},
        },
        "floor": {
            "type": "mesh", "vertices": fv, "faces": quad.faces,
            "bsdf": {"type": "diffuse", "reflectance": [0.5, 0.4, 0.3]},
        },
        "light": {
            "type": "mesh", "vertices": lv, "faces": light.faces,
            "emitter": {"type": "area", "radiance": [10.0, 10.0, 10.0]},
        },
    }
    scene, _ = load_dict(sd)
    return scene


def test_wavefront_matches_render_cornell(cornell):
    ref = np.asarray(
        render(cornell, PathIntegrator(max_depth=5), spp=4, spp_per_pass=4)
    )
    img = np.asarray(
        render_wavefront(cornell, spp=4, max_depth=5, n_lanes=1024,
                         poll_every=2)
    )
    assert ref.mean() > 0.01
    np.testing.assert_allclose(img, ref, atol=5e-5)


@pytest.mark.parametrize(
    "kw",
    [
        dict(n_lanes=2048),
        dict(n_lanes=2048, chunk=512, sort_every=1),
        dict(n_lanes=2048, chunk=512, sort_every=0),
    ],
)
def test_wavefront_matches_render_bvh(bvh_scene, kw):
    ref = np.asarray(
        render(bvh_scene, PathIntegrator(max_depth=5), spp=4, spp_per_pass=4)
    )
    img = np.asarray(
        render_wavefront(bvh_scene, spp=4, max_depth=5, poll_every=3, **kw)
    )
    assert ref.mean() > 1e-4
    np.testing.assert_allclose(img, ref, atol=5e-5)


def test_wavefront_tent_filter_matches(cornell):
    ref = np.asarray(
        render(cornell, PathIntegrator(max_depth=4), spp=4, spp_per_pass=4,
               rfilter="tent")
    )
    img = np.asarray(
        render_wavefront(cornell, spp=4, max_depth=4, rfilter="tent",
                         n_lanes=1024, poll_every=2)
    )
    np.testing.assert_allclose(img, ref, atol=5e-4)


@pytest.mark.parametrize(
    "kw",
    [
        dict(n_lanes=2048, chunk=512, sort_every=1, rounds_per_launch=8),
        dict(n_lanes=2048, chunk=None, sort_every=0, rounds_per_launch=4),
    ],
)
def test_wavefront_fused_rounds_match(bvh_scene, kw):
    """The scanned multi-round dispatch (_run_rounds) is the same program
    as the per-stage loop — images must agree to float-accumulation noise."""
    ref = np.asarray(
        render_wavefront(
            bvh_scene, spp=4, max_depth=5, poll_every=3,
            n_lanes=kw["n_lanes"], chunk=kw["chunk"],
            sort_every=kw["sort_every"],
        )
    )
    img = np.asarray(
        render_wavefront(bvh_scene, spp=4, max_depth=5, **kw)
    )
    np.testing.assert_allclose(img, ref, atol=5e-5)


@pytest.mark.parametrize(
    "kw",
    [
        dict(n_lanes=2048, steps=8, rounds_per_launch=4),
        dict(n_lanes=1024, steps=32, rounds_per_launch=2),
    ],
)
def test_persistent_matches_render(bvh_scene, kw):
    """The persistent state-machine renderer (incremental traversal)
    reproduces render()'s estimates ray-for-ray: same RNG dimensions, same
    MIS; only BVH-vs-brute float noise differs."""
    from mitsuba3_experiments_tpu.integrators.persistent import (
        render_persistent,
    )

    ref = np.asarray(
        render(bvh_scene, PathIntegrator(max_depth=5), spp=4, spp_per_pass=4)
    )
    img = np.asarray(
        render_persistent(bvh_scene, spp=4, max_depth=5, **kw)
    )
    assert ref.mean() > 1e-4
    np.testing.assert_allclose(img, ref, atol=5e-5)


def test_persistent_cornell_tent(cornell):
    from mitsuba3_experiments_tpu.integrators.persistent import (
        render_persistent,
    )

    ref = np.asarray(
        render(cornell, PathIntegrator(max_depth=4), spp=4, spp_per_pass=4,
               rfilter="tent")
    )
    img = np.asarray(
        render_persistent(cornell, spp=4, max_depth=4, rfilter="tent",
                          n_lanes=1024, steps=12, rounds_per_launch=3)
    )
    np.testing.assert_allclose(img, ref, atol=5e-4)
