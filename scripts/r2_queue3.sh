#!/bin/bash
# TPU chain 3 — runs from the .tpuwt snapshot so live edits can't race imports.
# 1. transition profile: packed-face _make_si before/after
# 2. full bench warm (persistent fwd + grad rungs) — driver runs bench.py at round end
# 3. Pallas traversal at small n (fault risk -> last-ish)
# 4. ReSTIR 1024^2 frame probe
set -x
cd /root/repo/.tpuwt
export PYTHONPATH=/root/.axon_site:/root/repo/.tpuwt

timeout 1800 python scripts/transition_profile.py 32768 16 \
  > /root/repo/out/transition_profile2.log 2>&1

BENCH_ATTEMPT_DEADLINE=3600 timeout 7300 python bench.py \
  > /root/repo/out/bench_full_r2.log 2>&1

timeout 1800 python scripts/pallas_trav_bench.py \
  '[{"n":2048,"tile":256}]' \
  > /root/repo/out/pallas_trav5.log 2>&1

timeout 2400 python scripts/restir_frame_probe.py 1024 32768 3 \
  > /root/repo/out/restir_probe_1024.log 2>&1

echo QUEUE3_DONE
