#!/usr/bin/env bash
# Timing sweep of all five backends at dev scale on one TPU chip.
set -euo pipefail
for b in step1x-edit flux-kontext qwen-image-edit; do
  echo "=== $b (vanilla) ==="
  regione-tpu --backend "$b" --dev --image_path "$1" --prompt "${2:-edit}" \
    --output_dir "out/$b-vanilla"
  echo "=== $b (RegionE) ==="
  regione-tpu --backend "$b" --dev --use_regione --image_path "$1" \
    --prompt "${2:-edit}" --output_dir "out/$b-regione"
done
