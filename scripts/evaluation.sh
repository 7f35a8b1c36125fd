#!/usr/bin/env bash
# Full evaluation pass (equivalent of reference script/Evaluation.sh):
#   1. pixel metrics vanilla-vs-RegionE per task -> metric.csv
#   2. item-weighted merge -> merged_metric.txt
#   3. VIEScore semantic judging (needs OpenAI key file) -> vie_score.csv
#
# Usage: scripts/evaluation.sh <vanilla_results_dir> <regione_results_dir> [key_file]
set -euo pipefail

VANILLA=${1:?vanilla results dir}
REGIONE=${2:?regione results dir}
KEYS=${3:-}

python -m regione_tpu.eval.run_metrics --folder1 "$VANILLA" --folder2 "$REGIONE"
python -m regione_tpu.eval.merge --direction "$REGIONE"
python -m regione_tpu.eval.merge --direction "$VANILLA" --pretrain

if [[ -n "$KEYS" ]]; then
  python -m regione_tpu.eval.run_viescore \
    --data_dir "$REGIONE" --backbone gpt4o --key_path "$KEYS"
fi
