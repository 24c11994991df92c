#!/bin/bash
# Round-4 queue 1: d65 record A/B, pipelined census, roofline probes.
cd /root/repo
echo "=== record A/B d65 ($(date -u +%H:%M)) ==="
timeout 8000 python scripts/record_ab.py 65 20 32 2>&1 | tail -10
echo "=== pipelined census d8 ($(date -u +%H:%M)) ==="
timeout 4000 python scripts/pipelined_census.py 32 65536 2>&1 | tail -4
echo "=== roofline d8 ($(date -u +%H:%M)) ==="
timeout 4000 python scripts/roofline_probe.py 8 819850 2>&1 | tail -4
echo "=== roofline d65 ($(date -u +%H:%M)) ==="
timeout 5000 python scripts/roofline_probe.py 65 258876 2>&1 | tail -4
echo "=== queue1 done ($(date -u +%H:%M)) ==="
