#!/bin/bash
# TPU chain 4 (HEAD snapshot): noop-calibrated profilers + persistent scan.
set -x
cd /root/repo/.tpuwt
export PYTHONPATH=/root/.axon_site:/root/repo/.tpuwt

timeout 2700 python scripts/persistent_profile.py 32768 16 \
  > /root/repo/out/persistent_profile3.log 2>&1

timeout 5400 python scripts/wavefront_bench.py \
  '[{"mode":"persistent","n_lanes":32768,"steps":16,"rpl":32},{"mode":"persistent","n_lanes":32768,"steps":8,"rpl":32},{"mode":"persistent","n_lanes":65536,"steps":16,"rpl":16},{"mode":"persistent","n_lanes":65536,"steps":8,"rpl":16}]' \
  > /root/repo/out/persistent_scan3.log 2>&1

timeout 2700 python scripts/transition_profile.py 32768 16 \
  > /root/repo/out/transition_profile3.log 2>&1

echo QUEUE4_DONE
