#!/bin/bash
# Round-4 queue 5 (session 2): d65 forward steps sweep, d8 record
# regression check after the D+1 radiance-row glob, then the
# reference-recipe runs (queue 4).
cd /root/repo
echo "=== d65 forward steps sweep ($(date -u +%H:%M)) ==="
timeout 8000 python scripts/pipelined_ab.py pipelined:65536:32:65 pipelined:65536:48:65 2>&1 | tail -4
echo "=== record A/B d8 (D+1 glob regression check) ($(date -u +%H:%M)) ==="
timeout 8000 python scripts/record_ab.py 8 20 32 2>&1 | tail -9
bash scripts/r4_queue4.sh
echo "=== queue5 done ($(date -u +%H:%M)) ==="
