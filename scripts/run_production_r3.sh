#!/bin/bash
# Round-3 production measurement pass (v2 — reruns after an early-fire race
# contaminated the first bench/mega timings with concurrent probe load).
# Waits for the phase-2 block-group sweep, redoes the phase-3 large-shape
# probes that ran contended, then measures production clean:
#   1. bench.py                      — headline kernel number
#   2. mega sim cold resume + warm   — end-to-end games/s across all 8 cells
#   3. default workflow              — sim with row export + full analyze
set -u
cd /root/repo
LOG=/tmp/prod_r3.log
WAIT_PID="${1:?usage: run_production_r3.sh <pid-to-wait-for>}"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
exec >> "$LOG" 2>&1

echo "=== phase 3 redo start $(date +%s) $(date) ==="
# bench ladder rungs (k=5 large block shapes) + the next H2H dispatch octave
# (throughput still rising at 262k games -> 2.57M games/s)
timeout 2000 python scripts/probe_fault_envelope.py --root-seed 102 --k 5 --ns 96,128 --timeout 900
timeout 2000 python scripts/probe_fault_envelope.py --k 2 --ns "" --h2h-batches 524288,1048576 --timeout 900

echo "=== bench start $(date +%s) $(date) ==="
timeout 900 python bench.py
echo "=== mega run (cold, populates AOT cache) start $(date +%s) $(date) ==="
# fresh dir: the aborted earlier run used the 100x43 plan; the 67x64 plan's
# coordinates would replay everything anyway
rm -rf data_mega_r3
timeout 3600 python -m farkle_ii_tpu --config configs/mega_config.yaml \
  --set io.results_dir_prefix=data_mega_r3/results \
  --set sim.seed_list=[102] run
echo "=== mega run (warm, timed) start $(date +%s) $(date) ==="
rm -rf data_mega_r3_warm
timeout 3600 python -m farkle_ii_tpu --config configs/mega_config.yaml \
  --set io.results_dir_prefix=data_mega_r3_warm/results \
  --set sim.seed_list=[102] run
echo "=== default sim start $(date +%s) $(date) ==="
timeout 3600 python -m farkle_ii_tpu --config configs/default_config.yaml \
  --set io.results_dir_prefix=data_default_r3/results \
  --set sim.row_dir=rows \
  --set tpu.fault_envelope_path=results/fault_envelope.json run
echo "=== default analyze start $(date +%s) $(date) ==="
timeout 5400 python -m farkle_ii_tpu --config configs/default_config.yaml \
  --set io.results_dir_prefix=data_default_r3/results \
  --set sim.row_dir=rows \
  --set tpu.fault_envelope_path=results/fault_envelope.json analyze pipeline
echo "=== production pass done $(date +%s) $(date) ==="
