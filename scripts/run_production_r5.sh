#!/bin/bash
# Round-5 production measurement pass (chained; assumes the probe sweeps
# and the warm-up bench have already populated the AOT cache):
#   1. wait for any running bench warm-up
#   2. re-probe the small H2H window shapes with the round-5 kernel
#      (ascending, stop-on-failure; the 256/512 shapes stay round-4 —
#      see tests/FAILURE_NOTES.md)
#   3. mega simulation cold (populates remaining executables) + warm (timed)
#   4. default-config k=5 row-export run (bit-packed rows, probed groups,
#      writer pool) — the round-5 row-throughput measurement
set -u
cd /root/repo
LOG=/tmp/prod_r5.log
exec >> "$LOG" 2>&1

if [ -f /tmp/bench.pid ]; then
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 10; done
fi

echo "=== phase 2: h2h window re-probe $(date +%s) $(date) ==="
timeout 3600 python scripts/probe_fault_envelope.py --root-seed 42 --k 2 --ns "" \
  --h2h-windows 32x2048,64x2048,128x2048 --timeout 1200

echo "=== phase 3: mega cold $(date +%s) $(date) ==="
rm -rf data_mega_r5
timeout 3600 python -m farkle_ii_tpu --config configs/mega_config.yaml \
  --set io.results_dir_prefix=data_mega_r5/results \
  --set sim.seed_list=[102] run
echo "=== phase 3: mega warm $(date +%s) $(date) ==="
rm -rf data_mega_r5_warm
timeout 3600 python -m farkle_ii_tpu --config configs/mega_config.yaml \
  --set io.results_dir_prefix=data_mega_r5_warm/results \
  --set sim.seed_list=[102] run

echo "=== phase 4: k=5 row-export run $(date +%s) $(date) ==="
rm -rf data_rows_r5
timeout 3600 python -m farkle_ii_tpu --config configs/default_config.yaml \
  --set io.results_dir_prefix=data_rows_r5/results \
  --set sim.seed_list=[42] --set sim.seed=42 \
  --set sim.row_dir=rows \
  --set tpu.fault_envelope_path=results/fault_envelope.json \
  run
echo "=== done $(date +%s) $(date) ==="
