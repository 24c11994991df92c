"""Stream compaction & ray reordering — fixed-shape, sort-based.

Replaces ``dr.compress`` (/root/reference/sppm.py:91, reductions.py:42-44) and
``dr.reorder_threads`` (/root/reference/nerad.py:225).  XLA demands static
shapes, so compaction keeps the wavefront size and *partitions*: active lanes
move to the front (stable), the count comes back as a traced scalar, and dead
lanes are masked downstream.  Reordering is a stable sort by an arbitrary key
(material id, hash cell, ...) returning the permutation so results can be
scattered back.
"""
from __future__ import annotations

import jax.numpy as jnp


def compress_indices(mask):
    """Indices of True lanes, packed to the front; tail is filled with the
    first False index (callers mask by count).  Returns (indices, count)."""
    n = mask.shape[0]
    # Stable partition: sort by (!mask) keeps original order within groups.
    perm = jnp.argsort(jnp.logical_not(mask), stable=True)
    count = jnp.sum(mask.astype(jnp.int32))
    return perm.astype(jnp.int32), count


def partition_by_key(key):
    """Stable sort permutation by integer key (thread-reordering analog).

    Returns perm such that key[perm] is sorted; apply with tree gather and
    invert with `invert_permutation` to scatter results back.
    """
    return jnp.argsort(key, stable=True).astype(jnp.int32)


def invert_permutation(perm):
    n = perm.shape[0]
    inv = jnp.zeros((n,), perm.dtype).at[perm].set(
        jnp.arange(n, dtype=perm.dtype)
    )
    return inv
