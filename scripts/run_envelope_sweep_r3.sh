#!/bin/bash
# Round-3 fault-envelope re-probe: steady-state speed per safe shape.
# Ordered by expected value: worst cells (k=10,12) first, then H2H dispatch
# shapes, then re-timings of the already-safe small-k shapes so best_ns can
# speed-rank instead of falling back to largest-safe.
set -u
cd /root/repo
LOG=/tmp/envprobe_r3.log
exec >> "$LOG" 2>&1
echo "=== sweep start $(date) ==="
python scripts/probe_fault_envelope.py --k 10,12 --ns 24,32,48,64,16 --timeout 900
python scripts/probe_fault_envelope.py --k 8 --ns 48,16 --timeout 900
python scripts/probe_fault_envelope.py --k 2 --ns 16,64 --h2h-batches 16384,32768,65536,131072,262144 --timeout 900
python scripts/probe_fault_envelope.py --k 3,4,5,6 --ns 64,43,16 --timeout 900
python scripts/probe_fault_envelope.py --k 2,3 --ns 96,128 --timeout 900
echo "=== sweep done $(date) ==="
