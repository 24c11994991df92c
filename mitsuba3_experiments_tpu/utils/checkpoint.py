"""Checkpoint / resume for training state pytrees.

The reference has no checkpointing at all (SURVEY.md section 5: weights live
only in optimizer state; only images are persisted).  Here: orbax-backed
save/restore of arbitrary pytrees (params + optimizer state + step), with a
plain-pickle fallback when orbax is unavailable.
"""
from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def save_checkpoint(path: str, state) -> None:
    """Persist a pytree (params/opt_state/step...) to `path`."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, state, force=True)
        ckpt.wait_until_finished()
    except Exception:
        host = jax.tree_util.tree_map(lambda x: np.asarray(x), state)
        with open(path + ".pkl", "wb") as f:
            pickle.dump(host, f)


def load_checkpoint(path: str, template):
    """Restore a pytree saved by save_checkpoint; `template` supplies the
    structure (and dtypes/shapes for orbax)."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        if os.path.isdir(path):
            ckpt = ocp.StandardCheckpointer()
            return ckpt.restore(path, template)
    except Exception:
        pass
    with open(path + ".pkl", "rb") as f:
        host = pickle.load(f)
    import jax.numpy as jnp

    return jax.tree_util.tree_map(lambda x: jnp.asarray(x), host)
