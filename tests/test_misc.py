"""Tests for dispatch (vcall analog), scene serialization round trip,
NRC integrator, XML loader, profiling utils."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba3_experiments_tpu.integrators import PathIntegrator, render
from mitsuba3_experiments_tpu.integrators.nrc import NRCIntegrator
from mitsuba3_experiments_tpu.ops.dispatch import (
    dispatch_masked,
    dispatch_sorted,
    reorder_threads,
)
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict
from mitsuba3_experiments_tpu.scene.serialize import scene_to_dict


def test_dispatch_masked_and_sorted(rng_np):
    fns = [lambda x: x * 2, lambda x: x + 10, lambda x: -x]
    tid = jnp.asarray(rng_np.integers(0, 3, 100))
    x = jnp.asarray(rng_np.normal(size=100).astype(np.float32))
    ref = np.select(
        [np.asarray(tid) == 0, np.asarray(tid) == 1, np.asarray(tid) == 2],
        [np.asarray(x) * 2, np.asarray(x) + 10, -np.asarray(x)],
    )
    np.testing.assert_allclose(np.asarray(dispatch_masked(fns, tid, x)), ref)
    np.testing.assert_allclose(np.asarray(dispatch_sorted(fns, tid, x)), ref, rtol=1e-6)


def test_reorder_threads(rng_np):
    key = jnp.asarray(rng_np.integers(0, 5, 64))
    x = jnp.asarray(rng_np.normal(size=(64, 3)).astype(np.float32))
    (xp,), inv = reorder_threads(key, (x,))
    # scattered back == original
    np.testing.assert_array_equal(
        np.asarray(jnp.take(xp, inv, axis=0)), np.asarray(x)
    )


def test_scene_round_trip():
    scene, _ = load_dict(cornell_box(res=32, spp=1))
    d2 = scene_to_dict(scene)
    scene2, _ = load_dict(d2)
    assert scene2.n_faces == scene.n_faces
    # same total surface area and emitter power
    np.testing.assert_allclose(
        float(scene2.emitters.face_dist.total),
        float(scene.emitters.face_dist.total),
        rtol=1e-5,
    )
    # renders allclose (to_dict.py:65 pattern)
    img1 = np.asarray(render(scene, PathIntegrator(max_depth=3), spp=32, seed=3))
    img2 = np.asarray(render(scene2, PathIntegrator(max_depth=3), spp=32, seed=3))
    # geometry identical; faces reordered so BVH order / RNG pairing differ —
    # compare converged-ish images loosely
    mask = img1.mean(-1) > 0.02
    rel = np.abs(img1 - img2)[mask] / (img1[mask] + 0.1)
    assert rel.mean() < 0.15, rel.mean()


def test_nrc_truncation_darker_than_path():
    scene, _ = load_dict(cornell_box(res=24, spp=1))
    ref = np.asarray(
        render(scene, PathIntegrator(max_depth=8, rr_depth=9), spp=64, seed=2)
    )
    img = np.asarray(render(scene, NRCIntegrator(max_depth=8), spp=64, seed=2))
    assert np.isfinite(img).all() and img.max() > 0
    # truncated segments lose energy -> mean at most the reference's (+noise)
    assert img.mean() <= ref.mean() * 1.05
    # but the first segment carries most energy
    assert img.mean() > 0.4 * ref.mean()


def test_nrc_with_cache_recovers_energy():
    from mitsuba3_experiments_tpu.models import (
        FieldConfig,
        HashGridConfig,
        NeradTrainer,
    )

    scene, _ = load_dict(cornell_box(res=24, spp=1))
    trainer = NeradTrainer(
        field_cfg=FieldConfig(
            grid=HashGridConfig(n_levels=4, log2_table_size=12,
                                base_resolution=4, finest_resolution=64),
            width=32, depth=3,
        ),
        batch_size=1 << 10, m_rhs=8, lr=2e-3,
    )
    init, step = trainer.make_train_step(scene)
    params, opt_state = init(jax.random.PRNGKey(0))
    for i in range(200):
        params, opt_state, _ = step(params, opt_state, jnp.uint32(i))

    ref = np.asarray(
        render(scene, PathIntegrator(max_depth=8, rr_depth=9), spp=32, seed=2)
    )
    img_trunc = np.asarray(
        render(scene, NRCIntegrator(max_depth=3, spread_c=1e-6), spp=32, seed=2)
    )
    img_cache = np.asarray(
        render(
            scene,
            NRCIntegrator(max_depth=3, spread_c=1e-6, cache=(params, trainer)),
            spp=32, seed=2,
        )
    )
    # cache closes (some of) the truncation gap
    gap_trunc = abs(ref.mean() - img_trunc.mean())
    gap_cache = abs(ref.mean() - img_cache.mean())
    assert gap_cache < gap_trunc, (gap_cache, gap_trunc)


def test_xml_loader_bedroom_skeleton():
    from mitsuba3_experiments_tpu.scene.xml import load_xml_dict

    d = load_xml_dict("/root/reference/data/bedroom/scene.xml")
    assert d["sensor"]["type"] == "perspective"
    assert d["sensor"]["film"]["width"] == 1280
    assert d["sensor"]["film"]["rfilter"] == "tent"
    assert d["integrator"]["max_depth"] == 65
    shapes = [v for v in d.values() if isinstance(v, dict) and v.get("type") in ("obj", "rectangle")]
    assert len(shapes) == 72
    emitters = [v for v in d.values() if isinstance(v, dict) and "emitter" in v]
    assert len(emitters) == 2


def test_kernel_history_cost_analysis():
    from mitsuba3_experiments_tpu.utils import kernel_history

    def f(x):
        return jnp.dot(x, x, preferred_element_type=jnp.float32)

    cost = kernel_history(f, jnp.ones((128, 128), jnp.float32))
    assert isinstance(cost, dict) and len(cost) > 0


def test_checkpoint_roundtrip(tmp_path):
    from mitsuba3_experiments_tpu.utils import load_checkpoint, save_checkpoint

    state = {
        "w": jnp.arange(12.0).reshape(3, 4),
        "step": jnp.asarray(7),
        "nested": {"b": jnp.ones((2,))},
    }
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, state)
    restored = load_checkpoint(p, state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state, restored,
    )


def test_spectrum_rgb_mode():
    from mitsuba3_experiments_tpu.core import spectrum as sp

    assert not sp.is_spectral
    s = sp.spectrum(2.0, n=4)
    assert s.shape == (4, 3)
    v = jnp.ones((5, 3))
    assert sp.to_world_mueller(v, None, None) is v
    assert sp.unpolarized_spectrum(v) is v


def test_xml_scene_level_emitter(tmp_path):
    """Scene-level <emitter> (constant/envmap) parses into the env tables
    (reference scenes attach envmaps at scene level, scene/xml.py)."""
    import numpy as np

    from mitsuba3_experiments_tpu.scene import load_dict
    from mitsuba3_experiments_tpu.scene.xml import load_xml_dict

    xml = """<scene version="3.0.0">
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <film type="hdrfilm">
          <integer name="width" value="8"/>
          <integer name="height" value="8"/>
        </film>
      </sensor>
      <shape type="rectangle">
        <bsdf type="diffuse"/>
      </shape>
      <emitter type="constant">
        <rgb name="radiance" value="0.25 0.5 1.0"/>
      </emitter>
    </scene>"""
    p = tmp_path / "s.xml"
    p.write_text(xml)
    d = load_xml_dict(str(p))
    ems = [v for v in d.values()
           if isinstance(v, dict) and v.get("type") == "constant"]
    assert len(ems) == 1
    scene, _ = load_dict(d)
    np.testing.assert_allclose(
        np.asarray(scene.emitters.env_radiance), [0.25, 0.5, 1.0]
    )
    assert scene.emitters.env_map.shape == (1, 1, 3)
    assert float(scene.emitters.env_select_p) == 0.0  # constant: not NEE'd


def test_nrc_online_trainer_learns_cache():
    """VERDICT r1 #6: NRCTrainer trains the cache online from unbiased path
    suffixes; loss decreases and the trained cache closes the truncation
    gap of a short-segment NRC render."""
    from mitsuba3_experiments_tpu.integrators.nrc import NRCTrainer
    from mitsuba3_experiments_tpu.models import FieldConfig, HashGridConfig

    scene, _ = load_dict(cornell_box(res=24, spp=1))
    trainer = NRCTrainer(
        field_cfg=FieldConfig(
            grid=HashGridConfig(n_levels=4, log2_table_size=12,
                                base_resolution=4, finest_resolution=64),
            width=32, depth=3,
        ),
        batch_size=1 << 10, lr=2e-3, spread_c=1e-6, max_depth=3,
        train_depth=8, train_spread_mult=1e5,
    )
    params, losses = trainer.train(scene, n_iters=250, seed=0)
    head = np.mean(losses[:50])
    tail = np.mean(losses[-50:])
    assert np.isfinite(losses).all()
    assert tail < 0.7 * head, (head, tail)

    ref = np.asarray(
        render(scene, PathIntegrator(max_depth=8, rr_depth=9), spp=32, seed=2)
    )
    img_trunc = np.asarray(
        render(scene, NRCIntegrator(max_depth=3, spread_c=1e-6), spp=32,
               seed=2)
    )
    img_cache = np.asarray(
        render(
            scene,
            NRCIntegrator(max_depth=3, spread_c=1e-6,
                          cache=(params, trainer)),
            spp=32, seed=2,
        )
    )
    gap_trunc = abs(ref.mean() - img_trunc.mean())
    gap_cache = abs(ref.mean() - img_cache.mean())
    assert gap_cache < gap_trunc, (gap_cache, gap_trunc)
