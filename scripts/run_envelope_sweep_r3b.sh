#!/bin/bash
# Phase 2: block-group probes (one dispatch = m whole 43-shuffle recovery
# blocks, flat batch). The mega plan's 43-shuffle blocks cap single-chunk
# sizes; grouped blocks are the only way past the cap. High value at k=2
# (envelope forces 16-shuffle chunks, 3x under the ns=64 speed) and at
# k=8-12 (speed rises monotonically with batch through ns=48).
set -u
cd /root/repo
LOG=/tmp/envprobe_r3.log
# wait for phase 1 (pid file) to release the chip
while kill -0 "$(cat /tmp/envprobe_r3.pid 2>/dev/null)" 2>/dev/null; do sleep 20; done
exec >> "$LOG" 2>&1
echo "=== phase 2 (block groups) start $(date) ==="
python scripts/probe_fault_envelope.py --root-seed 102 --k 2 --ns "" --block-groups 2,3 --nsb 43 --timeout 900
python scripts/probe_fault_envelope.py --root-seed 102 --k 12,10,8 --ns "" --block-groups 2,3,4 --nsb 43 --timeout 900
echo "=== phase 2 done $(date) ==="
