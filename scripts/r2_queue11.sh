#!/bin/bash
# TPU chain 11 (after queue10): LEAF_CAP A/B on the flagship forward render
# (scripts/leafcap_ab.py).  The iterations-per-ray knob: wider packed leaf
# rows are ~free (latency-bound gathers), fewer leaf rows + shallower tree
# mean fewer stepper iterations.  8 (current) vs 16 vs 32 at the headline
# 65536/24 operating point.
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

for i in $(seq 1 720); do
  grep -q QUEUE10_DONE out/r2_queue10.log 2>/dev/null && break
  sleep 60
done

# re-run the Pallas prefix-sum hardware check: the first run failed on
# Mosaic's missing cumsum lowering (fixed with log-step shift-adds in the
# kernel)
timeout 1800 python -u scripts/pallas_hw_check.py \
  > out/pallas_hw_check.log 2>&1

timeout 7200 python -u scripts/leafcap_ab.py 65536 24 \
  > out/leafcap_ab_8.log 2>&1

# host iteration probe (scripts/iters_probe.py): LEAF_CAP moves rows/ray
# 18.4 -> 18.2 (16) -> 17.5 (32) — internal rows dominate — while
# WIDTH=16 cuts them to 15.8.  Measure the width axis first, leaf caps
# as the control.
M3T_BVH_WIDTH=16 timeout 7200 python -u scripts/leafcap_ab.py 65536 24 \
  > out/leafcap_ab_w16.log 2>&1
M3T_LEAF_CAP=16 timeout 7200 python -u scripts/leafcap_ab.py 65536 24 \
  > out/leafcap_ab_16.log 2>&1
M3T_LEAF_CAP=32 timeout 7200 python -u scripts/leafcap_ab.py 65536 24 \
  > out/leafcap_ab_32.log 2>&1
echo QUEUE11_DONE
