"""Path-replay differentiable rendering (integrators/replay.py):
the record pass + differentiable replay must reproduce render()'s
estimates, and grad-of-replay must match grad-of-the-scan-AD integrator
(whose gradients are FD-validated in test_render.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mitsuba3_experiments_tpu.core import math as m
from mitsuba3_experiments_tpu.integrators import PathIntegrator, render
from mitsuba3_experiments_tpu.integrators.replay import (
    record_chunk,
    replay_radiance,
    replay_render_grad,
)
from mitsuba3_experiments_tpu.render import film as filmlib
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict, update
from mitsuba3_experiments_tpu.scene import mesh as meshlib


@pytest.fixture(scope="module")
def bvh_scene():
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
            "bsdf": {"type": "diffuse", "reflectance": [0.0, 0.0, 0.0]},
            "emitter": {"type": "area", "radiance": [8.0, 8.0, 8.0]},
        },
    }
    scene, _ = load_dict(sd)
    return scene


def _replay_image(scene, seed, spp, max_depth, rr_depth=4):
    w, h = scene.camera.resolution
    n = w * h * spp
    rec = record_chunk(
        scene, seed, 0, n, spp=spp, max_depth=max_depth,
        rr_depth=rr_depth, steps=8, rounds_per_launch=4,
    )
    L, pos, act0 = replay_radiance(
        scene, rec, jnp.uint32(seed), jnp.uint32(0), spp=spp,
        max_depth=max_depth, rr_depth=rr_depth,
    )
    film = filmlib.new_film(w, h)
    film = filmlib.put(
        film, pos, jnp.where(jnp.isfinite(L), L, 0.0), active=act0,
        rfilter="box",
    )
    return np.asarray(filmlib.develop(film))


@pytest.mark.parametrize("fixture", ["cornell", "bvh"])
def test_replay_matches_render(fixture, bvh_scene):
    if fixture == "cornell":
        scene, _ = load_dict(cornell_box(res=24))
    else:
        scene = bvh_scene
    a = np.asarray(render(scene, PathIntegrator(max_depth=5), seed=3,
                          spp=4, rfilter="box"))
    b = _replay_image(scene, seed=3, spp=4, max_depth=5)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5)


def test_replay_grad_matches_scan_ad(bvh_scene):
    scene = bvh_scene
    w, h = scene.camera.resolution
    spp, depth = 2, 4
    n = w * h * spp
    target = np.asarray(
        render(scene, PathIntegrator(max_depth=depth), seed=9, spp=spp,
               rfilter="box")
    )
    params = {
        "materials.base_color": scene.materials.base_color,
        "emitters.radiance": scene.emitters.radiance,
    }

    # reference: AD through the scan integrator (FD-validated elsewhere)
    integ_d = PathIntegrator(max_depth=depth, rr_depth=4,
                             differentiable=True)

    def loss(p):
        s = update(scene, p)
        img = render(s, integ_d, seed=5, spp=spp, rfilter="box")
        return jnp.sum((img - target) ** 2)

    g_ref = jax.grad(loss)(params)

    g_rep = replay_render_grad(
        scene, params, update, jnp.asarray(target), 5, 0, n,
        spp=spp, max_depth=depth, rr_depth=4, rfilter="box",
        steps=8, rounds_per_launch=4,
    )
    for k in params:
        a, b = np.asarray(g_ref[k]), np.asarray(g_rep[k])
        assert np.abs(b).max() > 0, f"no replay gradient for {k}"
        np.testing.assert_allclose(
            b, a, rtol=5e-3, atol=5e-4 * max(1e-9, np.abs(a).max())
        )


def test_record_full_matches_record_chunk(bvh_scene):
    """record_full (refilled persistent pass, flush-on-retire) must produce
    bitwise-identical records to record_chunk (one ray per lane): same RNG
    keying by camera-ray index, same traversal."""
    from mitsuba3_experiments_tpu.integrators.replay import (
        record_full,
        replay_grads_full,
    )

    scene = bvh_scene
    w, h = scene.camera.resolution
    spp, depth = 2, 4
    n = w * h * spp

    rec_c = record_chunk(
        scene, 3, 0, n, spp=spp, max_depth=depth, rr_depth=4,
        steps=8, rounds_per_launch=4,
    )
    # n_lanes << n forces many refill cycles through the flush path
    rec_f = record_full(
        scene, 3, n, spp=spp, max_depth=depth, rr_depth=4, steps=8,
        rounds_per_launch=4, n_lanes=256, pad_to=n + 128,
    )
    for name in ("prim", "u", "v", "occl"):
        a = np.asarray(getattr(rec_c, name))
        b = np.asarray(getattr(rec_f, name))
        if name in ("prim", "occl"):
            # discrete facts must agree exactly
            np.testing.assert_array_equal(b[:n], a, err_msg=name)
        else:
            # barycentrics: XLA fuses the triangle test differently at
            # different lane counts (256 vs 1536) -> ULP-level drift
            np.testing.assert_allclose(b[:n], a, atol=1e-4, err_msg=name)
        # padded rows stay empty
        pad = b[n:]
        if name == "prim":
            assert (pad == -1).all()
        else:
            assert (pad == 0).all()

    # grads over the padded full record == grads from replay_render_grad
    target = np.asarray(
        render(scene, PathIntegrator(max_depth=depth), seed=9, spp=spp,
               rfilter="box")
    )
    params = {
        "materials.base_color": scene.materials.base_color,
        "emitters.radiance": scene.emitters.radiance,
    }
    g_a = replay_render_grad(
        scene, params, update, jnp.asarray(target), 3, 0, n,
        spp=spp, max_depth=depth, rr_depth=4, rfilter="box",
        steps=8, rounds_per_launch=4,
    )
    g_b = replay_grads_full(
        scene, params, update, jnp.asarray(target), 3, rec_f, n,
        chunk=(n + 128) // 2, spp=spp, max_depth=depth, rr_depth=4,
        rfilter="box",
    )
    for k in params:
        a = np.asarray(g_a[k])
        np.testing.assert_allclose(
            np.asarray(g_b[k]), a, rtol=1e-3,
            atol=1e-4 * max(1e-9, np.abs(a).max()),
        )

    # the fused lax.scan chunk loop (default) == per-chunk dispatch loop
    g_c = replay_grads_full(
        scene, params, update, jnp.asarray(target), 3, rec_f, n,
        chunk=(n + 128) // 2, spp=spp, max_depth=depth, rr_depth=4,
        rfilter="box", fused=False,
    )
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_b[k]), np.asarray(g_c[k]), rtol=1e-5, atol=1e-7,
        )


def test_replay_grads_sorted_matches_full(bvh_scene):
    """Sorted-bucketed replay (rows permuted by path length, per-chunk
    truncated depth scans, adjoint decomposition of the MSE loss) must
    reproduce replay_grads_full's gradients: the truncation is exact by
    construction (path_lengths) and the adjoint restores linearity across
    pixel-sharing chunks."""
    from mitsuba3_experiments_tpu.integrators.replay import (
        path_lengths,
        record_full,
        replay_grads_full,
        replay_grads_sorted,
    )

    scene = bvh_scene
    w, h = scene.camera.resolution
    spp, depth = 2, 4
    n = w * h * spp
    pad = n + 128

    rec = record_full(
        scene, 3, n, spp=spp, max_depth=depth, rr_depth=4, steps=8,
        rounds_per_launch=4, n_lanes=256, pad_to=pad,
    )
    lens = np.asarray(path_lengths(rec))
    assert lens.min() >= 1 and lens.max() <= depth
    assert (lens[n:] == 1).all()  # padded rows: all-miss -> one step

    target = np.asarray(
        render(scene, PathIntegrator(max_depth=depth), seed=9, spp=spp,
               rfilter="box")
    )
    params = {
        "materials.base_color": scene.materials.base_color,
        "emitters.radiance": scene.emitters.radiance,
    }
    g_full = replay_grads_full(
        scene, params, update, jnp.asarray(target), 3, rec, n,
        chunk=pad // 2, spp=spp, max_depth=depth, rr_depth=4,
        rfilter="box",
    )
    # fused=True batches chunks into ascending pow2-sized run scans;
    # fused=False is the per-chunk dispatch loop — both must match the
    # uniform replay exactly
    for rfilter, fused in (("box", True), ("box", False), ("tent", True)):
        g_sort = replay_grads_sorted(
            scene, params, update, jnp.asarray(target), 3, rec, n,
            chunk=pad // 4, spp=spp, max_depth=depth, rr_depth=4,
            rfilter=rfilter, fused=fused,
        )
        if rfilter != "box":
            # the full-chunk decomposition is only exact for the box
            # filter (pixel-disjoint chunks); tent overlaps pixels, so
            # just require finite, nonzero grads there
            for k in params:
                b = np.asarray(g_sort[k])
                assert np.isfinite(b).all() and np.abs(b).max() > 0
            continue
        for k in params:
            a = np.asarray(g_full[k])
            np.testing.assert_allclose(
                np.asarray(g_sort[k]), a, rtol=1e-3,
                atol=1e-4 * max(1e-9, np.abs(a).max()),
            )


def test_replay_grads_trunc_matches_full(bvh_scene):
    """One-pass per-chunk-truncated replay == uniform full replay: chunks
    stay pixel-disjoint (per-chunk MSE decomposition holds) and the
    per-chunk class truncation is exact by path_lengths construction."""
    from mitsuba3_experiments_tpu.integrators.replay import (
        record_full,
        replay_grads_full,
        replay_grads_trunc,
    )

    scene = bvh_scene
    w, h = scene.camera.resolution
    spp, depth = 2, 12  # deep spec + RR-short paths -> truncation active
    n = w * h * spp
    pad = ((n + 127) // 128) * 128
    rec = record_full(
        scene, 3, n, spp=spp, max_depth=depth, rr_depth=3, steps=8,
        rounds_per_launch=4, n_lanes=256, pad_to=pad,
    )
    target = jnp.asarray(np.asarray(render(
        scene, PathIntegrator(max_depth=depth), seed=9, spp=spp,
        rfilter="box",
    )))
    params = {
        "materials.base_color": scene.materials.base_color,
        "emitters.radiance": scene.emitters.radiance,
    }
    kw = dict(chunk=128, spp=spp, max_depth=depth, rr_depth=3,
              rfilter="box")
    g_full = replay_grads_full(
        scene, params, update, target, 3, rec, n, **kw)
    g_tr = replay_grads_trunc(
        scene, params, update, target, 3, rec, n, **kw)
    for k in params:
        a, b = np.asarray(g_full[k]), np.asarray(g_tr[k])
        assert np.abs(a).max() > 0
        np.testing.assert_allclose(
            b, a, rtol=1e-4, atol=1e-5 * max(1e-9, np.abs(a).max()))
