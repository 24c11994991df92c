#!/bin/bash
# TPU chain 8 (after queue7's reference-scale ReSTIR curves):
#  1. Pallas prefix-sum on real hardware (VERDICT r1 weak #3 leftover)
#  2. dynamic-camera ReSTIR run (test-restir-dynamic.py analog)
#  3. flagship bench at the real bedroom max_depth=65 (fidelity datapoint;
#     the headline rung uses depth=8 like round 1 so history stays comparable)
#  4. nerad training curve on the chip (loss + val MSE per val_every)
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

timeout 1800 python scripts/pallas_hw_check.py \
  > out/pallas_hw_check.log 2>&1

cd examples
timeout 7200 python restir_eval.py dynamic 30 512 32768 \
  > /root/repo/out/restir_dynamic_512.log 2>&1
cp out/restir_dynamic_metrics.json \
  /root/repo/artifacts/restir_dynamic_512_metrics.json 2>/dev/null
cd /root/repo

BENCH_DEPTH=65 BENCH_ATTEMPT_DEADLINE=5400 timeout 7200 python bench.py \
  > out/bench_depth65.log 2>&1

cd examples
timeout 10000 python -u train_nerad.py 600 12 \
  > /root/repo/out/nerad_train_tpu.log 2>&1
cd /root/repo
echo QUEUE8_DONE
