#!/bin/bash
# TPU chain 7: ReSTIR reference-scale A/B curves (VERDICT r1 #9), run
# directly from /root/repo (the .tpuwt worktree is gone).  1024^2, chunked
# frames; the 256-spp reference is rendered once and cached in out/.
# Runs spatial, jacobian, spatial_spatial pairs; plots curves into artifacts/.
set -x
cd /root/repo/examples
export PYTHONPATH=/root/.axon_site:/root/repo

N_FRAMES="${N_FRAMES:-100}"
RES="${RES:-1024}"
CHUNK="${CHUNK:-32768}"

for MODE in spatial jacobian spatial_spatial; do
  timeout 14000 python restir_eval.py "$MODE" "$N_FRAMES" "$RES" "$CHUNK" \
    > /root/repo/out/restir_${MODE}_$RES.log 2>&1
  timeout 600 python restir_plot.py out/restir_${MODE}_metrics.json \
    /root/repo/artifacts/restir_${MODE}_${RES}_curves.png \
    >> /root/repo/out/restir_${MODE}_$RES.log 2>&1
  cp out/restir_${MODE}_metrics.json \
    /root/repo/artifacts/restir_${MODE}_${RES}_metrics.json 2>/dev/null
done
echo QUEUE7_DONE
