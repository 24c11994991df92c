#!/usr/bin/env python
"""Benchmark: rays/s/chip for path-MIS forward(+backward) on the flagship
bedroom-class scene (BASELINE.md primary metric).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no numbers (BASELINE.md), so vs_baseline is the ratio
against the last recorded run of this same bench (bench_history.json), or 1.0
on the first run.

Flags (env vars):
  BENCH_RES=WxH     film resolution         (default 1280x720)
  BENCH_SPP=N       samples per pixel       (default 4)
  BENCH_DEPTH=N     max path depth          (default 8)
  BENCH_TRIS=N      triangle budget         (default 2000000)
  BENCH_BACKWARD=1  also time forward+backward
  BENCH_SMALL=1     tiny config for smoke runs
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: TPU (remote) compiles of the render program
# take minutes; cache them across runs/rounds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    res = os.environ.get("BENCH_RES", "160x90" if small else "1280x720")
    w, h = (int(x) for x in res.split("x"))
    spp = int(os.environ.get("BENCH_SPP", "2" if small else "4"))
    depth = int(os.environ.get("BENCH_DEPTH", "4" if small else "8"))
    tris = int(os.environ.get("BENCH_TRIS", "100000" if small else "2000000"))
    try:
        _run(res, w, h, spp, depth, tris)
    except Exception as e:
        # graceful degrade: always emit a JSON line for the driver
        print(f"# full config failed ({type(e).__name__}); falling back",
              flush=True)
        _run("640x360", 640, 360, 2, depth, 200_000)


def _run(res, w, h, spp, depth, tris):
    from mitsuba3_experiments_tpu.integrators import PathIntegrator, render_pass
    from mitsuba3_experiments_tpu.render import film as filmlib
    from mitsuba3_experiments_tpu.scene.flagship import load_flagship

    scene, meta = load_flagship(res=(w, h), spp=spp, tri_budget=tris)
    integ = PathIntegrator(max_depth=depth, rr_depth=4)

    # chunked launches: the remote compiler's time explodes with lane
    # count, so one fixed-size program is compiled and reused for every
    # chunk of every pass (see integrators/common.py::render_pass)
    chunk = int(os.environ.get("BENCH_CHUNK", "32768"))
    n = w * h
    film = filmlib.new_film(w, h)
    # warmup / compile
    film = render_pass(
        scene, integ, jnp.uint32(0), jnp.uint32(0), film,
        spp_per_pass=1, rfilter="tent", chunk=chunk,
        lane_offset=jnp.uint32(0),
    )
    film.block_until_ready()
    print("# compile done", flush=True)

    iters = max(spp, 2)
    t0 = time.perf_counter()
    for i in range(iters):
        for off in range(0, n, chunk):
            film = render_pass(
                scene, integ, jnp.uint32(1), jnp.uint32(i), film,
                spp_per_pass=1, rfilter="tent", chunk=chunk,
                lane_offset=jnp.uint32(off),
            )
    film.block_until_ready()
    dt = time.perf_counter() - t0

    # rays/s accounting: primary rays per pass = W*H; each bounce costs one
    # closest-hit ray + one shadow ray. Count camera rays/s (the conventional
    # rays/s metric: samples traced per second) — depth-independent.
    camera_rays = w * h * iters
    rays_per_s = camera_rays / dt

    history_path = os.path.join(os.path.dirname(__file__), "bench_history.json")
    baseline = None
    if os.path.exists(history_path):
        try:
            with open(history_path) as f:
                baseline = json.load(f).get("rays_per_s")
        except Exception:
            baseline = None
    vs = rays_per_s / baseline if baseline else 1.0
    with open(history_path, "w") as f:
        json.dump(
            {
                "rays_per_s": rays_per_s,
                "config": {"res": res, "spp": spp, "depth": depth, "tris": tris},
                "device": str(jax.devices()[0]),
                "time_s": dt,
            },
            f,
        )

    print(
        json.dumps(
            {
                "metric": f"camera rays/s/chip (path-MIS fwd, bedroom-class {res} depth={depth}, {tris} tris)",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
