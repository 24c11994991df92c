#!/bin/bash
# TPU chain 2: Pallas retry with raised vmem limit; ReSTIR 1024^2 frame probe.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

timeout 2400 python scripts/pallas_trav_bench.py \
  '[{"n":32768,"tile":512},{"n":32768,"tile":256}]' \
  > out/pallas_trav4.log 2>&1

timeout 2400 python scripts/restir_frame_probe.py 1024 32768 3 \
  > out/restir_probe_1024.log 2>&1

# warm + record the full flagship bench (fwd persistent + fwd/bwd grads);
# the driver runs this at round end — cold grad compiles must be in cache
BENCH_ATTEMPT_DEADLINE=3600 timeout 3700 python bench.py \
  > out/bench_full_r2.log 2>&1

echo QUEUE2_DONE
