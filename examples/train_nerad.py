"""Neural-radiosity training driver — /root/reference/nerad.py:313-403
analog: train the hash-grid+SH field on the cornell box against the
one-bounce RHS, validate every `val_every` iterations with a render + MSE vs
a high-spp path reference.

Usage: python examples/train_nerad.py [iters] [batch_pow2]
"""
import sys

import _common  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba3_experiments_tpu.integrators import PathIntegrator, render
from mitsuba3_experiments_tpu.models import (
    FieldConfig,
    HashGridConfig,
    NeradIntegrator,
    NeradTrainer,
)
from mitsuba3_experiments_tpu.scene import cornell_box, load_dict
from mitsuba3_experiments_tpu.utils import mse, write_png

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
batch = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 14)

scene, _ = load_dict(cornell_box(res=128, spp=1))
ref = np.asarray(render(scene, PathIntegrator(max_depth=8, rr_depth=4), spp=256))

trainer = NeradTrainer(
    field_cfg=FieldConfig(
        grid=HashGridConfig(n_levels=8, log2_table_size=15,
                            base_resolution=8, finest_resolution=256),
        width=64, depth=4,
    ),
    batch_size=batch, m_rhs=32, lr=1e-3,
)
init, step = trainer.make_train_step(scene)
params, opt_state = init(jax.random.PRNGKey(0))

val_every = max(iters // 10, 1)
for i in range(iters):
    params, opt_state, loss = step(params, opt_state, jnp.uint32(i))
    if (i + 1) % val_every == 0:
        integ = NeradIntegrator(trainer=trainer, params=params)
        img = np.asarray(render(scene, integ, spp=2))
        print(f"it {i+1}: loss={float(loss):.5f} val_mse={mse(img, ref):.5f}")
        write_png(f"out/nerad_{i+1}.png", img)

write_png("out/nerad_ref.png", ref)
print("wrote out/nerad_*.png")
