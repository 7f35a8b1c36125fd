#!/usr/bin/env bash
# Canned mini-benchmark sweep: vanilla + RegionE generation over
# assets/minibench, then the full eval stack (PSNR/SSIM -> merge ->
# VIEScore).  This is the staged, runnable version of the reference's
# script/Evaluation.sh (GEdit-Bench needs HF downloads + production
# checkpoints; this subset ships in-repo).
#
# Usage:
#   bash scripts/run_minibench.sh <out_dir> --model_path <converted_ckpt> \
#        [--backend step1x-edit]
#   bash scripts/run_minibench.sh <out_dir> --mock          # no weights:
#        random dev-scale weights, validates the pipeline + timing only
#
# With real converted weights the PSNR row is the reference's headline
# fidelity metric (target >= 30 dB vs the vanilla run, BASELINE.md).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:?usage: run_minibench.sh <out_dir> [--mock | --model_path <dir>]}
shift
BACKEND="step1x-edit"
EXTRA=()
while [ $# -gt 0 ]; do
  case "$1" in
    --mock) EXTRA+=(--random_weights --preset tiny --size_level 64) ;;
    --backend) BACKEND=${2:?--backend needs a value}; shift ;;
    *) EXTRA+=("$1") ;;
  esac
  shift
done

COMMON=(--backend "$BACKEND" --evaluation --eval_dir assets/minibench
        --seed 110 "${EXTRA[@]}")

echo "== vanilla (dense) generation =="
python -m regione_tpu.cli.main "${COMMON[@]}" --output_dir "$OUT/vanilla"
echo "== RegionE generation =="
python -m regione_tpu.cli.main "${COMMON[@]}" --use_regione \
    --output_dir "$OUT/regione"

echo "== pixel metrics + merge =="
python -m regione_tpu.eval.run_metrics --folder1 "$OUT/vanilla" \
    --folder2 "$OUT/regione"
python - "$OUT/regione" <<'EOF'
import sys
from regione_tpu.eval.merge import merge_direction
print(merge_direction(sys.argv[1]))
EOF

echo "== VIEScore (dry-run backbone unless OPENAI_KEY_PATH is set) =="
BACKBONE=dryrun
[ -n "${OPENAI_KEY_PATH:-}" ] && BACKBONE=gpt4o
python -m regione_tpu.eval.run_viescore --data_dir assets/minibench \
    --gen_root "$OUT/regione" --backbone "$BACKBONE"
echo "minibench sweep complete -> $OUT"
