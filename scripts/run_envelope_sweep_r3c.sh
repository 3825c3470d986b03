#!/bin/bash
# Phase 3: larger single-chunk shapes for the mid-k cells (bench runs k=5;
# the k=10 curve shows speed still rising through ns=64, so probe beyond).
set -u
cd /root/repo
LOG=/tmp/envprobe_r3.log
# wait for phase 2 (pid file) to release the chip
while kill -0 "$(cat /tmp/envprobe_r3b.pid 2>/dev/null)" 2>/dev/null; do sleep 20; done
exec >> "$LOG" 2>&1
echo "=== phase 3 (large mid-k shapes) start $(date) ==="
python scripts/probe_fault_envelope.py --root-seed 102 --k 5 --ns 96,128 --timeout 900
python scripts/probe_fault_envelope.py --root-seed 102 --k 4,6 --ns 96 --timeout 900
echo "=== phase 3 done $(date) ==="
