#!/usr/bin/env bash
# Benchmark dataset download + preprocessing (reference script/load_data.sh:1-9).
# Requires network access + huggingface-cli; then reshapes into
# data/Processed/<bench>/<task>/{img/, metadata.jsonl}.
set -euo pipefail
mkdir -p data
huggingface-cli download --repo-type dataset black-forest-labs/kontext-bench \
  --local-dir data/Kontext-Bench
huggingface-cli download --repo-type dataset stepfun-ai/GEdit-Bench \
  --local-dir data/GEdit-Bench
python -m regione_tpu.eval.preprocess --out_dir data/Processed
