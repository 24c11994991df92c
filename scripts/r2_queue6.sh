#!/bin/bash
# TPU chain 6: ReSTIR reference-scale A/B curves (VERDICT r1 #9) after the
# queue5 measurement chain. 1024^2, chunked frames; ref image cached per
# resolution. Runs spatial then jacobian pairs; plots curves.
set -x
cd /root/repo/.tpuwt
export PYTHONPATH=/root/.axon_site:/root/repo/.tpuwt

N_FRAMES="${N_FRAMES:-100}"
RES="${RES:-1024}"
CHUNK="${CHUNK:-32768}"

cd examples
timeout 14000 python restir_eval.py spatial "$N_FRAMES" "$RES" "$CHUNK" \
  > /root/repo/out/restir_spatial_$RES.log 2>&1
timeout 14000 python restir_eval.py jacobian "$N_FRAMES" "$RES" "$CHUNK" \
  > /root/repo/out/restir_jacobian_$RES.log 2>&1
timeout 600 python restir_plot.py out/restir_spatial_metrics.json \
  /root/repo/artifacts/restir_spatial_${RES}_curves.png \
  >> /root/repo/out/restir_spatial_$RES.log 2>&1
timeout 600 python restir_plot.py out/restir_jacobian_metrics.json \
  /root/repo/artifacts/restir_jacobian_${RES}_curves.png \
  >> /root/repo/out/restir_jacobian_$RES.log 2>&1
cp out/restir_spatial_metrics.json \
  /root/repo/artifacts/restir_spatial_${RES}_metrics.json 2>/dev/null
cp out/restir_jacobian_metrics.json \
  /root/repo/artifacts/restir_jacobian_${RES}_metrics.json 2>/dev/null
echo QUEUE6_DONE
