#!/bin/bash
# TPU chain 5 (HEAD snapshot): health probe, profilers, scan, bench, pallas,
# restir. Stages continue on failure; everything runs from .tpuwt.
set -x
cd /root/repo/.tpuwt
export PYTHONPATH=/root/.axon_site:/root/repo/.tpuwt

timeout 900 python -c "
import time, jax
t0 = time.time()
print('devices:', jax.devices(), '%.1fs' % (time.time() - t0), flush=True)
import jax.numpy as jnp
print('sum ok:', float(jnp.sum(jnp.arange(8192.0))), flush=True)
" > /root/repo/out/tpu_health.log 2>&1 || { echo TPU_STILL_DOWN; exit 1; }

timeout 3600 python scripts/persistent_profile.py 32768 16 \
  > /root/repo/out/persistent_profile3.log 2>&1

timeout 5400 python scripts/wavefront_bench.py \
  '[{"mode":"persistent","n_lanes":32768,"steps":16,"rpl":32},{"mode":"persistent","n_lanes":32768,"steps":8,"rpl":32},{"mode":"persistent","n_lanes":65536,"steps":16,"rpl":16},{"mode":"persistent","n_lanes":65536,"steps":8,"rpl":16}]' \
  > /root/repo/out/persistent_scan3.log 2>&1

timeout 3600 python scripts/transition_profile.py 32768 16 \
  > /root/repo/out/transition_profile3.log 2>&1

BENCH_ATTEMPT_DEADLINE=3600 timeout 7300 python bench.py \
  > /root/repo/out/bench_full_r2.log 2>&1

timeout 1800 python scripts/pallas_trav_bench.py '[{"n":2048,"tile":256}]' \
  > /root/repo/out/pallas_trav5.log 2>&1

timeout 2400 python scripts/restir_frame_probe.py 1024 32768 3 \
  > /root/repo/out/restir_probe_1024.log 2>&1

echo QUEUE5_DONE
