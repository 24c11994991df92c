#!/bin/bash
# TPU chain 9 (after queue8): remaining SURVEY section-6 workloads at
# reference scale on the real chip:
#  1. normflow spiral, 10k iters x batch 2^14 (normflow.py:789-791 scale)
#  2. normflow image target, 3k iters (albert.jpg analog)
#  3. metropolis 16384 chains x 1000 iters KL harness (metropolis.py:226-233)
# Waits for QUEUE8_DONE so the chip is uncontended.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

for i in $(seq 1 720); do
  grep -q QUEUE8_DONE out/r2_queue8.log 2>/dev/null && break
  sleep 60
done

cd examples
timeout 7200 python -u train_normflow.py 10000 spiral \
  > /root/repo/out/normflow_spiral_tpu.log 2>&1
cp out/normflow_density.png /root/repo/artifacts/normflow_spiral_density.png 2>/dev/null
cp out/normflow_samples.png /root/repo/artifacts/normflow_spiral_samples.png 2>/dev/null

timeout 7200 python -u train_normflow.py 3000 image \
  > /root/repo/out/normflow_image_tpu.log 2>&1
cp out/normflow_density.png /root/repo/artifacts/normflow_image_density.png 2>/dev/null
cp out/normflow_samples.png /root/repo/artifacts/normflow_image_samples.png 2>/dev/null

timeout 3600 python -u metropolis_eval.py 16384 1000 \
  > /root/repo/out/metropolis_tpu.log 2>&1
cp out/metropolis_metrics.json /root/repo/artifacts/metropolis_tpu_metrics.json 2>/dev/null
cd /root/repo

# 4. small-n Pallas traversal A/B (BENCH.md: "Small-n A/B is queued") —
#    the 32k-lane run execution-faulted; close the loop with sizes the
#    scoped-vmem budget provably fits.
timeout 3600 python -u scripts/pallas_trav_bench.py \
  '[{"n":2048,"tile":256},{"n":8192,"tile":256},{"n":16384,"tile":512}]' \
  > out/pallas_trav_smalln.log 2>&1
echo QUEUE9_DONE
