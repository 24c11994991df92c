"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md section 4d):
sharded render equals the single-device render; gradient step all-reduces."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba3_experiments_tpu.integrators import PathIntegrator, render
from mitsuba3_experiments_tpu.parallel import (
    make_mesh,
    render_sharded,
    sharded_grad_step,
)
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict


@pytest.fixture(scope="module")
def box():
    scene, _ = load_dict(cornell_box(res=32, spp=1))
    return scene


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single_device(box):
    integ = PathIntegrator(max_depth=3, rr_depth=2)
    img1 = np.asarray(render(box, integ, spp=4, seed=5))
    mesh = make_mesh()
    img8 = np.asarray(render_sharded(box, integ, mesh, spp=4, seed=5))
    # same lanes, same RNG (lane index is global) -> bitwise-identical modulo
    # scatter-order float addition; allow tiny tolerance
    np.testing.assert_allclose(img8, img1, rtol=1e-4, atol=1e-5)


def test_sharded_render_uneven_wavefront(box):
    # 32*32 = 1024 lanes over 8 devices divides; use a 6-device mesh for a
    # non-dividing case (1024 % 6 != 0) to exercise the padding path
    integ = PathIntegrator(max_depth=2)
    mesh = make_mesh(6)
    img = np.asarray(render_sharded(box, integ, mesh, spp=1, seed=1))
    assert np.isfinite(img).all()
    img1 = np.asarray(render(box, integ, spp=1, seed=1))
    np.testing.assert_allclose(img, img1, rtol=1e-4, atol=1e-5)


def test_sharded_render_chunked_matches_single_device(box):
    # chunked per-device launches (VERDICT r1 #8): chunk*ndev = 384 does not
    # divide the 1024-lane wavefront, so the final launch wraps lanes to 0;
    # wrapped lanes re-trace lane 0 bit-identically so the weighted film
    # average is unchanged and the image equals the single-device render
    integ = PathIntegrator(max_depth=3, rr_depth=2)
    img1 = np.asarray(render(box, integ, spp=2, seed=7))
    mesh = make_mesh()
    img8 = np.asarray(
        render_sharded(box, integ, mesh, spp=2, seed=7, chunk=48)
    )
    np.testing.assert_allclose(img8, img1, rtol=1e-4, atol=1e-5)


def test_sharded_grad_step_allreduce(box):
    integ = PathIntegrator(max_depth=3, rr_depth=2, differentiable=True)
    mesh = make_mesh()
    params = {"emitters.radiance": box.emitters.radiance}
    target = jnp.zeros((32, 32, 3), jnp.float32)
    loss, grads = sharded_grad_step(
        box, params, target, jnp.uint32(0), mesh, integ, spp_per_pass=1
    )
    g = np.asarray(grads["emitters.radiance"])
    assert np.isfinite(float(loss))
    assert np.abs(g).max() > 0
    # grads are replicated (identical across devices by construction): check
    # the returned value is fully addressable and consistent
    assert g.shape == (1, 3)


def test_persistent_sharded_matches_single_device(box):
    """Sharded persistent renderer == single-device persistent renderer:
    per-device state machines over owned ray ranges, global-index RNG."""
    from mitsuba3_experiments_tpu.integrators.persistent import (
        render_persistent,
    )
    from mitsuba3_experiments_tpu.parallel import render_persistent_sharded

    img1 = np.asarray(
        render_persistent(box, spp=2, max_depth=3, n_lanes=512, steps=8,
                          rounds_per_launch=4, seed=3)
    )
    mesh = make_mesh()
    img8 = np.asarray(
        render_persistent_sharded(box, mesh, spp=2, max_depth=3,
                                  n_lanes=128, steps=8,
                                  rounds_per_launch=4, seed=3)
    )
    np.testing.assert_allclose(img8, img1, rtol=1e-4, atol=1e-5)
