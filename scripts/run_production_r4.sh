#!/bin/bash
# Round-4 production measurement pass:
#   1. probe the compact-fetch group families (the new production program)
#      at the mega shapes for every k — also pre-warms the mega AOT cache
#   2. probe the fused H2H attempt-window family ascending (stops at the
#      first failure; never escalates past a compile crash)
#   3. bench.py (headline + per-k, pre-warms the new per-k shapes)
#   4. mega simulation cold (populates cache) + warm (timed)
#   5. default sim with bit-packed row export + full analyze incl. H2H tail
set -u
cd /root/repo
LOG=/tmp/prod_r4.log
exec >> "$LOG" 2>&1

echo "=== phase 1: compact group probes $(date +%s) $(date) ==="
timeout 7200 python scripts/probe_fault_envelope.py --root-seed 102 \
  --k 2,3,4,5,6,8,10,12 --ns "" --block-groups 8 --nsb 64 \
  --group-families cscan,cflat --timeout 900

echo "=== phase 2: h2h window probes $(date +%s) $(date) ==="
timeout 5400 python scripts/probe_fault_envelope.py --root-seed 42 --k 2 --ns "" \
  --h2h-windows 32x2048,64x2048,128x2048,256x2048,512x2048 --timeout 1200

echo "=== phase 3: bench $(date +%s) $(date) ==="
timeout 3000 python bench.py

echo "=== phase 4: mega cold $(date +%s) $(date) ==="
rm -rf data_mega_r4
timeout 3600 python -m farkle_ii_tpu --config configs/mega_config.yaml \
  --set io.results_dir_prefix=data_mega_r4/results \
  --set sim.seed_list=[102] run
echo "=== phase 4: mega warm $(date +%s) $(date) ==="
rm -rf data_mega_r4_warm
timeout 3600 python -m farkle_ii_tpu --config configs/mega_config.yaml \
  --set io.results_dir_prefix=data_mega_r4_warm/results \
  --set sim.seed_list=[102] run

echo "=== phase 5: default sim + analyze $(date +%s) $(date) ==="
rm -rf data_default_r4
timeout 3600 python -m farkle_ii_tpu --config configs/default_config.yaml \
  --set io.results_dir_prefix=data_default_r4/results \
  --set sim.row_dir=rows \
  --set tpu.fault_envelope_path=results/fault_envelope.json run
timeout 5400 python -m farkle_ii_tpu --config configs/default_config.yaml \
  --set io.results_dir_prefix=data_default_r4/results \
  --set sim.row_dir=rows \
  --set tpu.fault_envelope_path=results/fault_envelope.json analyze pipeline
echo "=== production pass done $(date +%s) $(date) ==="
