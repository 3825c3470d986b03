#!/bin/bash
# Round-3 production measurement pass. Runs after the envelope sweeps
# (phase 3 pid) release the chip:
#   1. bench.py                      — headline kernel number
#   2. mega sim (seed 102)           — end-to-end games/s across all 8 cells
#   3. default workflow (seed 0)     — sim with row export + full analyze
#      pipeline, wall-clocked per phase
set -u
cd /root/repo
LOG=/tmp/prod_r3.log
while kill -0 "$(cat /tmp/envprobe_r3c.pid 2>/dev/null)" 2>/dev/null; do sleep 20; done
exec >> "$LOG" 2>&1

echo "=== bench start $(date +%s) $(date) ==="
timeout 900 python bench.py
echo "=== mega run (cold, populates AOT cache) start $(date +%s) $(date) ==="
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
