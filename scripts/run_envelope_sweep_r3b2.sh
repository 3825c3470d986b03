#!/bin/bash
# Phase 2b: flat-family block-group probes at m=8 (the scan family was
# probed by phase 2a; the faster family is k-dependent, measured scan wins
# at k=2/6/8, flat at k=5 — record both and let best_block_group choose).
set -u
cd /root/repo
LOG=/tmp/envprobe_r3.log
WAIT_PID="${1:?usage: run_envelope_sweep_r3b2.sh <pid-to-wait-for>}"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
exec >> "$LOG" 2>&1
echo "=== phase 2b (flat block groups m=8) start $(date) ==="
python scripts/probe_fault_envelope.py --root-seed 102 --k 2,3,4,5,6,8,10,12 --ns "" --block-groups 8 --group-families flat --nsb 64 --timeout 900
echo "=== phase 2b done $(date) ==="
