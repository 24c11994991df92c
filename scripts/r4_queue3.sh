#!/bin/bash
# Round-4 queue 3: headline bench refresh + reference-recipe runs.
cd /root/repo
echo "=== headline bench (d8 + d65 companion) ($(date -u +%H:%M)) ==="
BENCH_ATTEMPT_DEADLINE=4200 timeout 12000 python bench.py 2>&1 | tail -8
echo "=== nerad full recipe ($(date -u +%H:%M)) ==="
timeout 9000 python scripts/nerad_fullrecipe.py 1000 14 1000 2>&1 | tail -6
echo "=== pssmlt caustic metrics ($(date -u +%H:%M)) ==="
cd examples && timeout 5000 python run_pssmlt.py 256 200 caustic 2>&1 | tail -5
cd /root/repo
echo "=== queue3 done ($(date -u +%H:%M)) ==="
