#!/bin/bash
# Sequential TPU job chain (one process at a time on the axon tunnel).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

# 1. Pallas traversal A/B (i32 one-hot fix) — VERDICT r1 #4
timeout 2400 python scripts/pallas_trav_bench.py \
  '[{"n":32768,"tile":512},{"n":32768,"tile":256}]' \
  > out/pallas_trav3.log 2>&1

# 2. persistent lane-count scan: the 32k<->131k gap is unexplored
timeout 3000 python scripts/wavefront_bench.py \
  '[{"mode":"persistent","n_lanes":49152,"steps":8,"rpl":32},{"mode":"persistent","n_lanes":65536,"steps":8,"rpl":32}]' \
  > out/persistent_scan2.log 2>&1

# 3. transition sub-profile (owner of the 15 ms)
timeout 2400 python scripts/transition_profile.py 32768 16 \
  > out/transition_profile.log 2>&1

# 4. nerad fused-MLP A/B at an HBM-safe batch
timeout 2400 python scripts/nerad_fused_bench.py 30 4096 8 \
  > out/nerad_fused2.log 2>&1

echo QUEUE_DONE
