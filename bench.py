#!/usr/bin/env python
"""Benchmark: rays/s/chip for path-MIS forward AND forward+backward on the
flagship bedroom-class scene (BASELINE.md primary metric is fwd+bwd).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
with the companion number under "extra".

The axon remote compiler's latency explodes with lane count and can exceed
any reasonable deadline on a cold cache, so the bench is a *ladder*: each
config runs in a subprocess with a hard deadline; on expiry/failure the next
smaller config runs.  Compiles that complete are written to the persistent
.jax_cache, so successive invocations climb the ladder further.

Flags (env): BENCH_RES / BENCH_SPP / BENCH_DEPTH / BENCH_TRIS / BENCH_CHUNK /
BENCH_ATTEMPT_DEADLINE (s per rung, default 2400) / BENCH_SMALL=1.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def _ladder():
    small = os.environ.get("BENCH_SMALL") == "1"
    if small:
        return [dict(res="160x90", spp=2, depth=4, tris=100_000,
                     chunk=14_400, mode="lockstep")]
    env = {}
    for k, cast in (("BENCH_RES", str), ("BENCH_SPP", int),
                    ("BENCH_DEPTH", int), ("BENCH_TRIS", int),
                    ("BENCH_CHUNK", int)):
        if k in os.environ:
            env[k.split("_", 1)[1].lower()] = cast(os.environ[k])
    base = [
        # sched/steps: the two-path pipelined scheduler at its measured
        # optima — post slot-major (round 5) the RENDERER's best point is
        # 49152/32 (275.3k vs 267.9k at 65536) while the RECORDER stays
        # 65536/32 (280.8k vs 274.5k at 49152), so the lane counts split
        dict(res="1280x720", spp=4, depth=8, tris=2_000_000, chunk=768,
             sched="pipelined", steps=32, fwd_lanes=49152),
        dict(res="640x360", spp=2, depth=6, tris=500_000, chunk=768,
             sched="pipelined", steps=32),
        # last-resort rung: the round-1 lockstep path, whose tiny program is
        # always warm in .jax_cache (a cold persistent compile at a fresh
        # lane count can exceed any deadline through the axon relay)
        dict(res="160x90", spp=2, depth=4, tris=100_000, chunk=14_400,
             mode="lockstep"),
    ]
    if env:
        base.insert(0, {**base[0], **env})
    return base


def _d65_rung():
    """The reference bedroom's actual spec (scene.xml:6 max_depth=65) as a
    companion measurement: same scene/res, depth 65, sorted replay (the
    measured winner at this depth — BENCH.md round 4).  Skippable with
    BENCH_SKIP_D65=1."""
    if os.environ.get("BENCH_SKIP_D65") == "1" or \
            os.environ.get("BENCH_SMALL") == "1":
        return None
    # renderer steps=32 with the round-5 dense gen-retire (chip A/B:
    # dense/32 218.2k vs the round-4 scatter/48 optimum 212.6k);
    # recorder stays steps=48/scatter until re-swept (flush="auto"
    # keeps the scatter at d65 — the dense write would stream 4 GB/round)
    return dict(res="1280x720", spp=4, depth=65, tris=2_000_000, chunk=768,
                sched="pipelined", steps=32, rec_steps=48)


def _run_cfg(cfg, deadline):
    """One worker subprocess; returns the parsed JSON result or None."""
    cmd = [
        sys.executable, os.path.join(REPO, "bench.py"), "--worker",
        json.dumps(cfg),
    ]
    try:
        out = subprocess.run(
            cmd, timeout=deadline, capture_output=True, text=True,
            cwd=REPO,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode == 0 and lines:
            return json.loads(lines[-1])
        print(
            f"# config {cfg} failed rc={out.returncode}: "
            f"{out.stderr.strip().splitlines()[-1][:200] if out.stderr.strip() else ''}",
            flush=True,
        )
    except subprocess.TimeoutExpired:
        print(f"# config {cfg} exceeded {deadline}s (cold compile?); "
              f"falling back", flush=True)
    return None


def main():
    deadline = int(os.environ.get("BENCH_ATTEMPT_DEADLINE", "2400"))
    for cfg in _ladder():
        res = _run_cfg(cfg, deadline)
        if res is not None:
            # companion rung: the reference's own depth-65 spec, reported
            # under extra so the headline stays config-comparable across
            # rounds (VERDICT r3 #1/#4)
            d65 = _d65_rung()
            if d65 is not None and cfg.get("depth") == 8:
                r65 = _run_cfg(d65, deadline)
                if r65 is not None:
                    res.setdefault("extra", {})["fwd_bwd_d65_rays_per_s"] = \
                        r65["value"]
                    res["extra"]["fwd_d65_rays_per_s"] = \
                        r65.get("extra", {}).get("fwd_rays_per_s")
            print(json.dumps(res))
            return
    # absolute last resort: report zero rather than nothing
    print(json.dumps({
        "metric": "camera rays/s/chip (path-MIS fwd, bedroom-class)",
        "value": 0.0, "unit": "rays/s", "vs_baseline": 0.0,
    }))


def _history_load():
    path = os.path.join(REPO, "bench_history.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                h = json.load(f)
            # migrate the round-1 flat schema {"rays_per_s": ...,
            # "config": {...}} to the config-keyed schema (VERDICT r1 #10:
            # ladder fallbacks must not compare across configs)
            if "rays_per_s" in h and "config" in h:
                key = _cfg_key(h["config"])
                h = {key: {"fwd": h["rays_per_s"]}}
            return h
        except Exception:
            return {}
    return {}


def _cfg_key(cfg):
    return (
        f"{cfg['res']}-spp{cfg['spp']}-d{cfg['depth']}-t{cfg['tris']}"
    )


def worker(cfg):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from functools import partial

    import jax.numpy as jnp

    from mitsuba3_experiments_tpu.integrators import (
        PathIntegrator,
        render_pass,
    )
    from mitsuba3_experiments_tpu.integrators.persistent import (
        render_persistent,
    )
    from mitsuba3_experiments_tpu.render import film as filmlib
    from mitsuba3_experiments_tpu.scene.flagship import load_flagship
    from mitsuba3_experiments_tpu.scene.params import traverse, update

    w, h = (int(x) for x in cfg["res"].split("x"))
    spp, depth, tris = cfg["spp"], cfg["depth"], cfg["tris"]
    chunk = cfg["chunk"]

    scene, meta = load_flagship(res=(w, h), spp=spp, tri_budget=tris)
    n = w * h

    # ------------------------- forward (persistent) ----------------------
    # the persistent state-machine renderer is the fastest forward path
    # (BENCH.md round-2 scan); equality with render() is tested, so the
    # benchmark measures the production renderer, not the debug one.
    # mode="lockstep" (the small fallback rung) uses the round-1 chunked
    # launches instead — tiny always-warm programs.
    # scheduler selection: "persistent" (single-path, round-3 default) or
    # "pipelined" (two paths per lane share one engine — round 4); both
    # produce identical images (tests/test_pipelined.py)
    sched = cfg.get("sched", os.environ.get("BENCH_SCHED", "persistent"))
    if sched == "pipelined":
        from mitsuba3_experiments_tpu.integrators.pipelined import (
            record_full_pipelined as _record,
            render_pipelined as _render,
        )
    else:
        from mitsuba3_experiments_tpu.integrators.replay import (
            record_full as _record,
        )
        _render = render_persistent

    if cfg.get("mode") == "lockstep":
        integ = PathIntegrator(max_depth=depth, rr_depth=4)

        def fwd(seed, pass_idx):
            film = filmlib.new_film(w, h)
            for off in range(0, n, chunk):
                film = render_pass(
                    scene, integ, seed, pass_idx, film, spp_per_pass=1,
                    rfilter="tent", chunk=chunk,
                    lane_offset=jnp.uint32(off),
                )
            return filmlib.develop(film)

        img = fwd(jnp.uint32(0), jnp.uint32(0))
        jax.block_until_ready(img)
        print("# fwd compile done", flush=True)
        t0 = time.perf_counter()
        img = fwd(jnp.uint32(1), jnp.uint32(0))
        jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        rays_per_s = n / dt
    else:
        pkw = dict(
            spp=spp, max_depth=depth, rr_depth=4, rfilter="tent",
            n_lanes=cfg.get("fwd_lanes", cfg.get("n_lanes", 65536)),
            steps=cfg.get("steps", 20),
            rounds_per_launch=cfg.get("rpl", 32),
        )
        img = _render(scene, seed=0, **pkw)
        jax.block_until_ready(img)
        print("# fwd compile done", flush=True)

        t0 = time.perf_counter()
        img = _render(scene, seed=1, **pkw)
        jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        rays_per_s = (n * spp) / dt
    print(f"# fwd {rays_per_s:.0f} rays/s", flush=True)

    # ---------------- forward+backward (BASELINE primary) ----------------
    # Gradients of a per-pixel MSE wrt material base_color and emitter
    # radiance — the adjoint workload of BASELINE.md ("rays/s/chip,
    # path-MIS forward+backward").
    target = img
    diff_params = {
        "materials.base_color": scene.materials.base_color,
        "emitters.radiance": scene.emitters.radiance,
    }

    if cfg.get("mode") == "lockstep":
        # small fallback rung: AD through the rematerialized scan (tiny,
        # always-warm programs)
        iters = max(spp, 2)
        integ_d = PathIntegrator(max_depth=depth, rr_depth=4,
                                 differentiable=True)

        @partial(jax.jit, static_argnames=("chunk_",))
        def grad_chunk(params, seed, pass_idx, lane_offset, target, *,
                       chunk_: int):
            def loss(p):
                s = update(scene, p)
                f0 = filmlib.new_film(w, h)
                f0 = render_pass(
                    s, integ_d, seed, pass_idx, f0, spp_per_pass=1,
                    rfilter="box", chunk=chunk_,
                    lane_offset=lane_offset,
                )
                img = filmlib.develop(f0)
                msk = (f0[..., 3] > 0.0)[..., None]
                return jnp.sum(jnp.where(msk, (img - target) ** 2, 0.0))

            return jax.grad(loss)(params)

        g = grad_chunk(diff_params, jnp.uint32(0), jnp.uint32(0),
                       jnp.uint32(0), target, chunk_=chunk)
        jax.block_until_ready(g)
        print("# fwd+bwd compile done", flush=True)

        bwd_iters = max(1, iters // 2)
        acc = g
        t0 = time.perf_counter()
        for i in range(bwd_iters):
            for off in range(0, n, chunk):
                g = grad_chunk(
                    diff_params, jnp.uint32(1), jnp.uint32(i),
                    jnp.uint32(off), target, chunk_=chunk,
                )
                acc = jax.tree_util.tree_map(jnp.add, acc, g)
        jax.block_until_ready(acc)
        dt_b = time.perf_counter() - t0
        n_bwd_rays = n * bwd_iters
    else:
        # production path: ONE full-frame record pass (persistent machine
        # with refill — records flush to HBM rows as each path retires, so
        # record runs at the forward renderer's rate instead of being
        # straggler-bound per chunk), then differentiable replay over the
        # record in uniform chunks with no traversal in the AD graph
        # (integrators/replay.py; record_full == record_chunk and replay
        # grads match the scan-AD integrator — tests/test_replay.py)
        from mitsuba3_experiments_tpu.integrators.replay import (
            replay_grads,
        )

        # BENCH_REPLAY: auto (default — sorted for deep scans, full for
        # shallow; see replay.replay_grads) | sorted | full, same
        # gradients either way (tests/test_replay.py)
        replay_mode = cfg.get(
            "replay", os.environ.get("BENCH_REPLAY", "auto")
        )

        n_rays = n * spp
        lanes = cfg.get("n_lanes", 65536)
        rchunk = cfg.get("replay_chunk", 131072)
        pad = ((n_rays + rchunk - 1) // rchunk) * rchunk
        # rec_steps: the recorder's round length can differ from the
        # renderer's (deep specs amortize the round boundary over longer
        # rounds — d65 chip sweep: record steps 48 beats 32 by 7.6%,
        # artifacts/r4/d65_filmrec2.log)
        rkw = dict(
            spp=spp, max_depth=depth, rr_depth=4,
            steps=cfg.get("rec_steps", cfg.get("steps", 20)),
            rounds_per_launch=cfg.get("rpl", 32),
        )

        # sorted replay needs the forward film for its adjoint; the
        # pipelined recorder produces it as a free byproduct
        # (return_film=True), eliminating the sorted mode's entire
        # forward bucketed pass (integrators/pipelined.py)
        sorted_active = replay_mode == "sorted" or (
            replay_mode == "auto" and depth >= 16
        )
        rec_film = sorted_active and sched == "pipelined"

        def fwd_bwd(seed):
            if rec_film:
                rec, film = _record(
                    scene, seed, n_rays, n_lanes=lanes, pad_to=pad,
                    return_film=True, rfilter="box", **rkw,
                )
            else:
                rec, film = _record(
                    scene, seed, n_rays, n_lanes=lanes, pad_to=pad, **rkw,
                ), None
            return replay_grads(
                scene, diff_params, update, target, seed, rec, n_rays,
                chunk=rchunk, spp=spp, max_depth=depth, rr_depth=4,
                rfilter="box", mode=replay_mode, film=film,
            )

        g = fwd_bwd(0)
        jax.block_until_ready(g)
        print("# fwd+bwd compile done", flush=True)

        t0 = time.perf_counter()
        acc = fwd_bwd(1)
        jax.block_until_ready(acc)
        dt_b = time.perf_counter() - t0
        n_bwd_rays = n_rays

    fwdbwd_rays_per_s = n_bwd_rays / dt_b
    print(f"# fwd+bwd {fwdbwd_rays_per_s:.0f} rays/s", flush=True)

    key = _cfg_key(cfg)
    hist = _history_load()
    prev = hist.get(key, {})
    vs = fwdbwd_rays_per_s / prev["fwd_bwd"] if prev.get("fwd_bwd") else 1.0
    hist[key] = {
        "fwd": rays_per_s, "fwd_bwd": fwdbwd_rays_per_s,
        "chunk": chunk, "device": str(jax.devices()[0]),
    }
    with open(os.path.join(REPO, "bench_history.json"), "w") as f:
        json.dump(hist, f, indent=1)

    extra = {"fwd_rays_per_s": round(rays_per_s, 1)}
    # roofline ledger (BENCH.md): architectural ceiling = the chip's
    # measured dependent-gather row floor divided by the ACTIVE rows each
    # ray needs (scripts/roofline_probe.py writes roofline.json on chip);
    # pct_of_ceiling is the honest MFU analog ("published": {} in
    # BASELINE.json — there is no external number to beat).
    try:
        with open(os.path.join(REPO, "roofline.json")) as f:
            rl = json.load(f).get(f"d{depth}", {})
        if rl.get("fwd_ceiling_rays_s"):
            extra["pct_of_ceiling_fwd"] = round(
                100.0 * rays_per_s / rl["fwd_ceiling_rays_s"], 1
            )
        if rl.get("fwdbwd_ceiling_rays_s"):
            extra["pct_of_ceiling_fwd_bwd"] = round(
                100.0 * fwdbwd_rays_per_s / rl["fwdbwd_ceiling_rays_s"], 1
            )
    except Exception:
        pass
    print(json.dumps({
        "metric": (
            f"camera rays/s/chip (path-MIS fwd+bwd, bedroom-class "
            f"{cfg['res']} depth={depth}, {tris} tris)"
        ),
        "value": round(fwdbwd_rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(json.loads(sys.argv[2]))
    else:
        main()
