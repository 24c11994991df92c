#!/bin/bash
# TPU chain 13 (after queue12):
#  1. Pallas prefix-sum hardware check, third attempt (cumsum -> shift-adds
#     -> concat of static slices; pad's lowering needed dynamic_slice).
#  2. Full bench.py: the leafcap A/B measured the CURRENT code at 285.8k
#     rays/s fwd on the headline config (vs the recorded 200.2k) — refresh
#     the recorded headline and prime .jax_cache for the driver's final run.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

for i in $(seq 1 720); do
  grep -q QUEUE12_DONE out/r2_queue12.log 2>/dev/null && break
  sleep 60
done

timeout 1800 python -u scripts/pallas_hw_check.py \
  > out/pallas_hw_check.log 2>&1

BENCH_ATTEMPT_DEADLINE=5400 timeout 11000 python bench.py \
  > out/bench_refresh.log 2>&1
tail -1 out/bench_refresh.log
echo QUEUE13_DONE
