"""Chip A/B: pipelined recorder flush=scatter vs flush=dense (round-5
strided ownership).  The d8 recorder pays ~13 ms/round for its two packed
flush scatters (52-159 ns/row, width-growing — scatter_probe); the dense
gen-indexed flush streams ~0.5 GB/round instead.  Records the flagship
frame, digests must be EQUAL.

Usage: python scripts/record_flush_ab.py [depth] [cfg ...]
  cfg = steps:flush[:lanes], e.g. 32:scatter 32:dense:49152
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from mitsuba3_experiments_tpu.integrators.pipelined import (
    record_full_pipelined,
)
from mitsuba3_experiments_tpu.scene.flagship import load_flagship


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfgs = sys.argv[2:] or ["32:scatter", "32:dense", "24:dense",
                            "16:dense"]
    w, h, spp = 1280, 720, 4
    scene, _ = load_flagship(res=(w, h), spp=spp, tri_budget=2_000_000)
    n_rays = w * h * spp
    chunk = 131072
    pad = ((n_rays + chunk - 1) // chunk) * chunk

    @jax.jit
    def _checksum(rec):
        n, d = rec.prim.shape
        mix = (jnp.arange(n, dtype=jnp.uint32)[:, None]
               * jnp.uint32(2654435761)
               + jnp.arange(d, dtype=jnp.uint32)[None, :]
               * jnp.uint32(40503))
        out = {}
        for f in ("prim", "u", "v", "occl"):
            a = getattr(rec, f)
            bits = (a.astype(jnp.uint32) if f in ("prim", "occl")
                    else jax.lax.bitcast_convert_type(a, jnp.uint32))
            out[f] = jnp.sum((bits ^ mix).astype(jnp.uint32))
        return out

    results = {"depth": depth}
    ref_sum = None
    for c in cfgs:
        parts = c.split(":")
        stp, flush = parts[0], parts[1]
        lanes = int(parts[2]) if len(parts) > 2 else 65536
        kw = dict(spp=spp, max_depth=depth, rr_depth=4, steps=int(stp),
                  rounds_per_launch=32, n_lanes=lanes, pad_to=pad,
                  flush=flush)
        rec = record_full_pipelined(scene, 1, n_rays, **kw)
        jax.block_until_ready(rec.prim)
        s = {k: int(v) for k, v in
             jax.device_get(_checksum(rec)).items()}
        if ref_sum is None:
            ref_sum = s
        eq = s == ref_sum
        del rec
        t0 = time.perf_counter()
        rec = fnrec = record_full_pipelined(scene, 1, n_rays, **kw)
        jax.block_until_ready(rec.prim)
        dt = time.perf_counter() - t0
        del rec, fnrec
        rate = n_rays / dt
        print(f"record {c}: {dt:.2f}s = {rate:.0f} rays/s "
              f"digests {'EQUAL' if eq else 'DIFFER'}", flush=True)
        results[c] = {"record_s": dt, "rays_s": rate, "digest_eq": eq}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
