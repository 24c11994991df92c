"""ReSTIR GI estimator tests — the bias/variance-vs-reference harness of
/root/reference/test-restir-spatial.py:53-76 shrunk to assertion size."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba3_experiments_tpu.integrators import PathIntegrator, render
from mitsuba3_experiments_tpu.integrators.restir import (
    RestirGI,
    RestirReservoir,
    RestirSample,
    reservoir_merge,
    reservoir_update,
)
from mitsuba3_experiments_tpu.core.rng import Sampler
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict

RES = 48


@pytest.fixture(scope="module")
def box():
    scene, _ = load_dict(cornell_box(res=RES, spp=1))
    return scene


def test_reservoir_update_statistics():
    """Streaming reservoir picks proportionally to weights."""
    n = 1 << 14
    res = RestirReservoir.zeros(n)
    sampler = Sampler.create(0, n)
    # stream 3 samples with weights 1, 2, 3; mark them by x_v.x = 0,1,2
    for i, wgt in enumerate([1.0, 2.0, 3.0]):
        s = RestirSample.zeros(n)
        s = dataclasses.replace(
            s, x_v=jnp.full((n, 3), float(i), jnp.float32)
        )
        res, sampler = reservoir_update(
            res, sampler, s, jnp.full((n,), wgt), jnp.ones((n,), bool)
        )
    picks = np.asarray(res.z.x_v[:, 0])
    frac = np.bincount(picks.astype(int), minlength=3) / n
    np.testing.assert_allclose(frac, [1 / 6, 2 / 6, 3 / 6], atol=0.02)
    assert int(res.M[0]) == 3
    np.testing.assert_allclose(np.asarray(res.w), 6.0)


def test_restir_frames_converge_to_path_reference(box):
    ref = np.asarray(
        render(box, PathIntegrator(max_depth=4, rr_depth=9), spp=512, seed=7)
    )

    integ = RestirGI(
        max_depth=4,
        rr_depth=2,
        bias_correction=True,
        jacobian=True,
        max_M_spatial=500,
        max_M_temporal=30,
        initial_search_radius=8.0,
    )
    state = integ.init_state(box)
    frame = jax.jit(
        lambda st, seed: integ.render_frame(box, st, seed)
    )

    mses = []
    acc = 0.0
    for i in range(24):
        img, state = frame(state, jnp.uint32(i))
        mses.append(float(jnp.mean((img - ref) ** 2)))
        if i >= 8:
            acc = acc + np.asarray(img)
    acc /= 24 - 8
    assert np.isfinite(mses).all()
    # frame-averaged estimate converges near the reference: low MSE, correct
    # overall energy (ReSTIR per-frame images stay noisy; the average is the
    # meaningful estimator, mirroring the reference's bias metric
    # test-restir-spatial.py:53-76)
    avg_mse = float(((acc - ref) ** 2).mean())
    assert avg_mse < 0.25 * mses[0], (avg_mse, mses[0])
    assert abs(acc.mean() / ref.mean() - 1.0) < 0.12, (acc.mean(), ref.mean())


def test_restir_dynamic_camera(box):
    """Camera translation between frames (test-restir-dynamic.py:25-32):
    reprojection keeps temporal reuse working — frames stay finite and the
    state advances."""
    integ = RestirGI(max_depth=3, rr_depth=2, initial_search_radius=6.0)
    state = integ.init_state(box)
    scene = box
    for i in range(3):
        cam = scene.camera
        tw = cam.to_world.at[0, 3].add(0.02)  # slide camera in x
        scene = dataclasses.replace(
            scene, camera=dataclasses.replace(cam, to_world=tw)
        )
        img, state = jax.jit(
            lambda sc, st, seed: integ.render_frame(sc, st, seed)
        )(scene, state, jnp.uint32(i))
        assert bool(jnp.all(jnp.isfinite(img)))
    assert int(state.frame) == 3


def test_restir_chunked_frame_matches_whole_frame(box):
    """render_frame_chunked == render_frame: stage RNG is keyed by
    (pixel, stage), so pixel-band launches pick identical samples; only
    XLA contraction order differs (different program shapes), so agreement
    is to float noise.  The chunked path is how reference-scale
    resolutions run through the axon compile wall."""
    integ = RestirGI(max_depth=3, rr_depth=2, initial_search_radius=6.0)
    state1 = integ.init_state(box)
    state2 = integ.init_state(box)
    for i in range(3):
        img1, state1 = integ.render_frame(box, state1, jnp.uint32(i))
        # 24x24 box -> 576 px; chunk 200 exercises the padded tail band
        img2, state2 = integ.render_frame_chunked(
            box, state2, jnp.uint32(i), chunk=200
        )
        np.testing.assert_allclose(
            np.asarray(img2), np.asarray(img1), rtol=2e-3, atol=2e-4
        )
    np.testing.assert_allclose(
        np.asarray(state2.search_radius), np.asarray(state1.search_radius)
    )
