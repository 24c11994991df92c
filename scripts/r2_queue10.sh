#!/bin/bash
# TPU chain 10 (after queue9): ReSTIR A/B on the curved-geometry sphere
# scene, where reconnection Jacobians deviate from 1 — the flat cornell box
# leaves the jacobian/bias-correction A/B deltas in noise (see
# artifacts/restir_{spatial,jacobian}_1024_metrics.json).  Records the
# running-mean |bias| metric (mabs_bias) alongside the reference's metrics.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

for i in $(seq 1 720); do
  grep -q QUEUE9_DONE out/r2_queue9.log 2>/dev/null && break
  sleep 60
done

cd examples
for MODE in jacobian spatial; do
  timeout 10000 python restir_eval.py "$MODE" 60 512 32768 sphere \
    > /root/repo/out/restir_${MODE}_sphere_512.log 2>&1
  timeout 600 python restir_plot.py out/restir_${MODE}_sphere_metrics.json \
    /root/repo/artifacts/restir_${MODE}_sphere_512_curves.png \
    >> /root/repo/out/restir_${MODE}_sphere_512.log 2>&1
  cp out/restir_${MODE}_sphere_metrics.json \
    /root/repo/artifacts/restir_${MODE}_sphere_512_metrics.json 2>/dev/null
done
cd /root/repo
echo QUEUE10_DONE
