#!/bin/bash
# Round-3 queue: sorted-replay A/Bs + headline bench refresh (SBVH tree).
cd /root/repo
echo "=== replay sorted vs full, depth 8 ($(date -u +%H:%M)) ==="
timeout 4800 python scripts/replay65_probe.py 4 8 2>&1 | tail -6
echo "=== replay sorted vs full, depth 65 ($(date -u +%H:%M)) ==="
timeout 6000 python scripts/replay65_probe.py 4 65 2>&1 | tail -6
echo "=== headline bench refresh ($(date -u +%H:%M)) ==="
BENCH_ATTEMPT_DEADLINE=4200 timeout 9000 python bench.py 2>&1 | tail -8
echo "=== done ($(date -u +%H:%M)) ==="
