#!/bin/bash
# TPU chain 12 (after queue11): re-run the dynamic-camera ReSTIR eval with
# the per-frame reference fix (a static frame-0 reference measured scene
# divergence, not estimator error — the first run's MSE "grew" 0.11 -> 0.70
# purely because the camera moved away from the cached view).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

for i in $(seq 1 720); do
  grep -q QUEUE11_DONE out/r2_queue11.log 2>/dev/null && break
  sleep 60
done

cd examples
timeout 10000 python restir_eval.py dynamic 20 512 32768 \
  > /root/repo/out/restir_dynamic_512.log 2>&1
timeout 600 python restir_plot.py out/restir_dynamic_metrics.json \
  /root/repo/artifacts/restir_dynamic_512_curves.png \
  >> /root/repo/out/restir_dynamic_512.log 2>&1
cp out/restir_dynamic_metrics.json \
  /root/repo/artifacts/restir_dynamic_512_metrics.json 2>/dev/null
cd /root/repo
echo QUEUE12_DONE
