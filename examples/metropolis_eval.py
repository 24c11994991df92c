"""Metropolis sampler validation — /root/reference/metropolis.py:168-264
analog: 16384 chains x 1000 iterations against the analytic bimodal target,
KL divergence + mean/std tracking, histogram dump.

Usage: python examples/metropolis_eval.py [chains] [iters]
"""
import json
import sys

import _common  # noqa: F401
import numpy as np

from mitsuba3_experiments_tpu.integrators.metropolis import (
    analytic_target,
    run_chain_1d,
)

chains = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

kls, hist, target = run_chain_1d(n_chains=chains, n_iters=iters, seed=0)
centers = (np.arange(len(hist)) + 0.5) / len(hist)
mean = float((hist * centers).sum())
t_mean = float((target * centers).sum())
std = float(np.sqrt((hist * (centers - mean) ** 2).sum()))
t_std = float(np.sqrt((target * (centers - t_mean) ** 2).sum()))

print(f"KL history (every 50 it): {[round(k, 4) for k in kls]}")
print(f"chain mean/std: {mean:.4f}/{std:.4f}  target: {t_mean:.4f}/{t_std:.4f}")
with open("out/metropolis_metrics.json", "w") as f:
    json.dump(
        {"kl": kls, "hist": hist.tolist(), "target": target.tolist(),
         "mean": mean, "std": std},
        f,
    )
print("wrote out/metropolis_metrics.json")
