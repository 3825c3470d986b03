#!/bin/bash
# Phase 2: scanned block-group probes at nsb=64 (one dispatch = lax.scan of
# m whole 64-shuffle recovery blocks; per-block packed aggregates). The scan
# family amortizes dispatch/fetch round trips while every scan step keeps
# the fault-probed per-block batch shape, so fault risk tracks the already
# -probed chunk shapes. The mega plan is 67 blocks of 64 (batching config).
set -u
cd /root/repo
LOG=/tmp/envprobe_r3.log
# wait for phase 1 (pid file) to release the chip
while kill -0 "$(cat /tmp/envprobe_r3.pid 2>/dev/null)" 2>/dev/null; do sleep 20; done
exec >> "$LOG" 2>&1
echo "=== phase 2 (scanned block groups, nsb=64) start $(date) ==="
python scripts/probe_fault_envelope.py --root-seed 102 --k 2,3,4,5,6,8,10,12 --ns "" --block-groups 8 --nsb 64 --timeout 900
python scripts/probe_fault_envelope.py --root-seed 102 --k 2,3,4,5,6,8,10,12 --ns "" --block-groups 4 --nsb 64 --timeout 900
echo "=== phase 2 done $(date) ==="
