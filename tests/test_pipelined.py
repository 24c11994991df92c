"""Two-path pipelined scheduler (integrators/pipelined.py).

Scheduling must not change estimates: per-ray radiance is identical to the
single-path persistent machine (same RNG dimensions, same _shade core) —
the images must match bit-for-bit modulo the identical deferred splat.
"""
import numpy as np
import pytest

import jax.numpy as jnp  # noqa: F401

from mitsuba3_experiments_tpu.integrators.persistent import render_persistent
from mitsuba3_experiments_tpu.integrators.pipelined import render_pipelined
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict


@pytest.fixture(scope="module")
def box():
    scene, _ = load_dict(cornell_box(res=32, spp=4))
    return scene


@pytest.mark.parametrize(
    "kw",
    [
        dict(spp=4, max_depth=5, rr_depth=2, steps=8, rounds_per_launch=4,
             n_lanes=512),
        # lanes far below the wavefront -> heavy refill traffic; odd steps
        dict(spp=2, max_depth=8, rr_depth=3, steps=5, rounds_per_launch=3,
             n_lanes=96),
        # three in-flight paths per lane (round-4 session-2 S-slot
        # generalization) — scheduling must still not change estimates
        dict(spp=4, max_depth=5, rr_depth=2, steps=9, rounds_per_launch=3,
             n_lanes=256, n_slots=3),
        # chunked arming (round-4 session-3): scheduler every 4th engine
        # iteration; steps not divisible by arm_every on purpose
        dict(spp=4, max_depth=5, rr_depth=2, steps=10, rounds_per_launch=3,
             n_lanes=256, arm_every=4),
        dict(spp=2, max_depth=8, rr_depth=3, steps=6, rounds_per_launch=3,
             n_lanes=96, n_slots=3, arm_every=3),
    ],
    ids=["base", "tiny-lanes-deep", "three-slot", "arm4", "arm3-slot3"],
)
def test_pipelined_matches_persistent(box, kw):
    pkw = {k: v for k, v in kw.items()
           if k not in ("n_slots", "arm_every")}
    a = np.asarray(render_persistent(box, seed=5, rfilter="tent",
                                     **{**pkw, "n_lanes": 1024}))
    b = np.asarray(render_pipelined(box, seed=5, rfilter="tent", **kw))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_pipelined_engine_stays_busy(box):
    """The scheduler's point: with two slots per lane, the engine idles
    less.  Count live-engine iterations via the stepper by instrumenting
    one round on a mid-frame state — the pipelined machine must beat the
    single-path machine's live share on the same workload."""
    # (Statistical smoke: full idle-share accounting runs on chip via
    # scripts/roofline_probe.py; here just assert both renderers complete
    # a full frame with identical images at a lane count that forces many
    # refills, which exercises every scheduler path.)
    a = np.asarray(render_persistent(
        box, seed=9, spp=4, max_depth=4, rr_depth=2, steps=8,
        rounds_per_launch=2, n_lanes=256,
    ))
    b = np.asarray(render_pipelined(
        box, seed=9, spp=4, max_depth=4, rr_depth=2, steps=8,
        rounds_per_launch=2, n_lanes=128,
    ))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_dense_retire_matches_scatter(box):
    """Strided ray ownership + gen-indexed dense retire (round-5) must be
    invisible in the image: RNG and shading key on the RAY index, so
    reassigning which lane traces which ray and replacing the retire
    scatter with the dense generation write changes nothing.  Exercises
    G>1 (n_lanes far below the wavefront), a non-dividing lane count, and
    3 slots (S*N not a power of two)."""
    a = np.asarray(render_pipelined(
        box, seed=5, spp=4, max_depth=5, rr_depth=2, steps=8,
        rounds_per_launch=4, n_lanes=512, retire="scatter"))
    for kw in (dict(n_lanes=512), dict(n_lanes=96),
               dict(n_lanes=96, n_slots=3)):
        b = np.asarray(render_pipelined(
            box, seed=5, spp=4, max_depth=5, rr_depth=2, steps=8,
            rounds_per_launch=4, retire="dense", **kw))
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6,
                                   err_msg=str(kw))


def test_pipelined_recorder_matches_record_full(box):
    """record_full_pipelined must produce a bit-equal PathRecord: same
    rays, same RNG dims, same packed flush layout — only the engine
    scheduling (and the bitmask occlusion bookkeeping) differ."""
    from mitsuba3_experiments_tpu.integrators.pipelined import (
        record_full_pipelined,
    )
    from mitsuba3_experiments_tpu.integrators.replay import record_full

    n = 32 * 32 * 4
    pad = n + 96
    kw = dict(spp=4, max_depth=6, rr_depth=2, steps=7,
              rounds_per_launch=3, pad_to=pad)
    a = record_full(box, 3, n, n_lanes=256, **kw)
    b = record_full_pipelined(box, 3, n, n_lanes=128, **kw)
    c = record_full_pipelined(box, 3, n, n_lanes=96, n_slots=3, **kw)
    d = record_full_pipelined(box, 3, n, n_lanes=128, arm_every=4, **kw)
    # round-5 strided-ownership dense gen flush: same PathRecord, and
    # exercised at G>1 with a non-dividing lane count
    e = record_full_pipelined(box, 3, n, n_lanes=96, flush="dense", **kw)
    for f in ("prim", "u", "v", "occl"):
        np.testing.assert_array_equal(
            np.asarray(getattr(e, f)), np.asarray(getattr(a, f)),
            err_msg=f"dense {f}",
        )
    for f in ("prim", "u", "v", "occl"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b, f)), np.asarray(getattr(a, f)), err_msg=f
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(c, f)), np.asarray(getattr(a, f)),
            err_msg=f"3-slot {f}",
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(d, f)), np.asarray(getattr(a, f)),
            err_msg=f"arm4 {f}",
        )

def test_record_film_matches_replay_forward(box):
    """record_full_pipelined(return_film=True)'s film is the SAME film the
    sorted replay's forward pass would rebuild from the record (same rays,
    same RNG dims, same shading core) — and feeding it back via film=...
    must leave the sorted gradients equal to the uniform full replay."""
    from mitsuba3_experiments_tpu.integrators.pipelined import (
        record_full_pipelined,
    )
    from mitsuba3_experiments_tpu.integrators.replay import (
        replay_grads_full,
        replay_grads_sorted,
        replay_radiance,
    )
    from mitsuba3_experiments_tpu.integrators import PathIntegrator, render
    from mitsuba3_experiments_tpu.render import film as filmlib
    from mitsuba3_experiments_tpu.scene.params import update

    w, h = box.camera.resolution
    spp, depth = 2, 6
    n = w * h * spp
    pad = n + 2 * 128

    rec, film = record_full_pipelined(
        box, 7, n, spp=spp, max_depth=depth, rr_depth=2, steps=7,
        rounds_per_launch=3, n_lanes=128, pad_to=pad, return_film=True,
        rfilter="box",
    )

    # the film must equal a from-record forward rebuild (replay_radiance
    # over all rows, natural order)
    L, pos, act0 = replay_radiance(
        box, rec, 7, 0, spp=spp, max_depth=depth, rr_depth=2,
        ray_end=jnp.uint32(n),
    )
    film_ref = filmlib.put(
        filmlib.new_film(w, h), pos, jnp.where(jnp.isfinite(L), L, 0.0),
        active=act0, rfilter="box",
    )
    np.testing.assert_allclose(
        np.asarray(film), np.asarray(film_ref), rtol=1e-5, atol=1e-6
    )

    # grads: sorted with the recorder's film == uniform full replay
    target = np.asarray(
        render(box, PathIntegrator(max_depth=depth), seed=11, spp=spp,
               rfilter="box")
    )
    params = {
        "materials.base_color": box.materials.base_color,
        "emitters.radiance": box.emitters.radiance,
    }
    g_full = replay_grads_full(
        box, params, update, jnp.asarray(target), 7, rec, n,
        chunk=pad // 2, spp=spp, max_depth=depth, rr_depth=2,
        rfilter="box",
    )
    g_sort = replay_grads_sorted(
        box, params, update, jnp.asarray(target), 7, rec, n,
        chunk=pad // 4, spp=spp, max_depth=depth, rr_depth=2,
        rfilter="box", film=film,
    )
    for k in params:
        a = np.asarray(g_full[k])
        np.testing.assert_allclose(
            np.asarray(g_sort[k]), a, rtol=1e-3,
            atol=1e-4 * max(1e-9, np.abs(a).max()),
        )
