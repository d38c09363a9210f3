#!/usr/bin/env bash
# End-to-end pipeline demo: train -> infer -> roles -> phases -> visualize.
# Runs on synthetic fixtures (no dataset needed); ~10 min on the TPU chip,
# CPU works too. Artifacts land in $OUT.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${OUT:-/tmp/or4d_demo}"
mkdir -p "$OUT"

echo "=== L3 train (tiny config, synthetic scenes) ==="
python -m or4d_tpu.cli train --config tiny --epochs 2 --limit 16 \
  --checkpoint-dir "$OUT/ckpts"

echo "=== L3 infer -> scan_relations json ==="
python -m or4d_tpu.cli infer --config tiny --checkpoint-dir "$OUT/ckpts" \
  --split test --output "$OUT/scan_relations_tiny_test.json"

echo "=== L4 heuristic roles ==="
python -m or4d_tpu.cli roles --relations "$OUT/scan_relations_tiny_test.json" \
  --output "$OUT/roles.json"

echo "=== L4 phase recognition ==="
python -m or4d_tpu.cli phases --relations "$OUT/scan_relations_tiny_test.json" \
  --roles "$OUT/roles.json" --output-dir "$OUT/phases_to_frames"

echo "=== L5 visualization ==="
python -m or4d_tpu.cli visualize --relations "$OUT/scan_relations_tiny_test.json" \
  --output-dir "$OUT/vis" --limit 5

echo "=== artifacts ==="
find "$OUT" -type f | sort | head -30
