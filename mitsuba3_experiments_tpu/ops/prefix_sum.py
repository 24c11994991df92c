"""Parallel prefix sum.

The reference hand-rolls a Hillis-Steele scan with gather/scatter because
Dr.Jit lacked one (/root/reference/prefix_sum.py:9-36).  On TPU the idiomatic
primitive is ``jnp.cumsum`` (XLA lowers it to a log-depth scan already), so
that is the default; a Pallas blocked scan kernel is provided for the large-N
case and as the building block the SPPM/hash-grid offsets use.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def prefix_sum(x, exclusive: bool = False):
    """Inclusive (default) or exclusive prefix sum along axis 0."""
    s = jnp.cumsum(x, axis=0)
    if exclusive:
        s = jnp.concatenate([jnp.zeros_like(s[:1]), s[:-1]], axis=0)
    return s


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def prefix_sum_pallas(x, block: int = 2048, interpret: bool = False):
    """Blocked inclusive scan as a Pallas TPU kernel.

    Grid walks blocks sequentially (TPU grid order is sequential per core),
    carrying the running total in SMEM scratch — the classic
    scan-then-propagate pattern without a second pass.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    pad = (-n) % block
    xp = jnp.pad(x, ((0, pad),))
    nblocks = xp.shape[0] // block

    def kernel(x_ref, o_ref, carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[0] = jnp.zeros((), x_ref.dtype)

        blk = x_ref[...]
        # intra-block inclusive scan as log2(block) shift-adds: Mosaic has
        # no cumsum (and no dynamic_slice from jnp.pad's lowering) on
        # hardware, but concat of static slices + add are plain VPU ops
        scanned = blk
        zeros = jnp.zeros_like(blk)
        shift = 1
        while shift < block:
            scanned = scanned + jnp.concatenate(
                [zeros[:shift], scanned[:-shift]]
            )
            shift *= 2
        o_ref[...] = scanned + carry_ref[0]
        carry_ref[0] = carry_ref[0] + scanned[-1]

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((block,), lambda i: (i,))],
        out_specs=pl.BlockSpec((block,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        scratch_shapes=[pltpu.SMEM((1,), x.dtype)],
        interpret=interpret,
    )(xp)
    return out[:n]
