#!/bin/bash
# Phase 2: block-group probes at nsb=64 (one dispatch = m whole 64-shuffle
# recovery blocks, flat batch). The mega plan now uses 68 blocks of 64
# shuffles (batching.target_batches) so groups are 64-aligned; speed rises
# monotonically with batch at every k, so grouped blocks are the path past
# the single-block ceiling — highest value at k=8-12 where blocks are small.
set -u
cd /root/repo
LOG=/tmp/envprobe_r3.log
# wait for phase 1 (pid file) to release the chip
while kill -0 "$(cat /tmp/envprobe_r3.pid 2>/dev/null)" 2>/dev/null; do sleep 20; done
exec >> "$LOG" 2>&1
echo "=== phase 2 (block groups, nsb=64) start $(date) ==="
python scripts/probe_fault_envelope.py --root-seed 102 --k 12,10,8 --ns "" --block-groups 2,3,4 --nsb 64 --timeout 900
python scripts/probe_fault_envelope.py --root-seed 102 --k 2,3 --ns "" --block-groups 2 --nsb 64 --timeout 900
echo "=== phase 2 done $(date) ==="
