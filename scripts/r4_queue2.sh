#!/bin/bash
# Round-4 queue 2: slot-major re-measure + record A/Bs + headline bench.
cd /root/repo
echo "=== pipelined census (slot-major) ($(date -u +%H:%M)) ==="
timeout 4000 python scripts/pipelined_census.py 32 65536 2>&1 | tail -3
echo "=== pipelined steps re-sweep ($(date -u +%H:%M)) ==="
timeout 8000 python scripts/pipelined_ab.py pipelined:65536:28 pipelined:65536:32 pipelined:65536:40 2>&1 | tail -5
echo "=== record A/B d8 (slot-major) ($(date -u +%H:%M)) ==="
timeout 8000 python scripts/record_ab.py 8 20 32 2>&1 | tail -9
echo "=== record A/B d65 ($(date -u +%H:%M)) ==="
timeout 9000 python scripts/record_ab.py 65 20 32 2>&1 | tail -9
echo "=== queue2 done ($(date -u +%H:%M)) ==="
