#!/bin/bash
# Round-4 queue 4 (session 2): reference-recipe runs after the d65
# film-from-record probe frees the chip.
cd /root/repo
echo "=== nerad full recipe 1000 iters batch 2^14 M=32 ($(date -u +%H:%M)) ==="
timeout 9000 python scripts/nerad_fullrecipe.py 1000 14 1000 2>&1 | tail -8
echo "=== pssmlt caustic metrics ($(date -u +%H:%M)) ==="
(cd examples && timeout 5000 python run_pssmlt.py 256 200 caustic 2>&1 | tail -5)
echo "=== queue4 done ($(date -u +%H:%M)) ==="
