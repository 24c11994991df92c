#!/bin/bash
# TPU chain 14 (after queue13): lane/steps operating-point rescan for the
# persistent forward renderer.  The 65536/24 point was picked before the
# one-scatter film splats landed; the cost balance may have shifted.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

for i in $(seq 1 720); do
  grep -q QUEUE13_DONE out/r2_queue13.log 2>/dev/null && break
  sleep 60
done

for PT in "49152 24" "65536 16" "65536 32" "98304 24"; do
  set -- $PT
  timeout 3600 python -u scripts/leafcap_ab.py "$1" "$2" \
    > "out/opscan_${1}_${2}.log" 2>&1
  tail -1 "out/opscan_${1}_${2}.log"
done
echo QUEUE14_DONE
