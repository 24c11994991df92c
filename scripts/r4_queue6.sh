#!/bin/bash
# Round-4 queue 6 (session 2): S-slot scheduler A/B + pow2-shift marginal.
cd /root/repo
echo "=== 3-slot fwd A/B d8 ($(date -u +%H:%M)) ==="
timeout 9000 python scripts/pipelined_ab.py pipelined:65536:32 pipelined:65536:40:8:3 pipelined:65536:48:8:3 pipelined:65536:56:8:3 2>&1 | tail -6
echo "=== queue6 done ($(date -u +%H:%M)) ==="
