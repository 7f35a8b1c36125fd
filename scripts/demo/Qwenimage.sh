#!/usr/bin/env bash
# Vanilla + demo + evaluation driver for Qwen-Image-Edit — TPU equivalent
# of the reference script/Qwenimage.sh.  --int4 is the single-chip format
# for the full 60-block 20.6B backbone (FULLSIZE_QWEN60.json); drop it on
# a tp>=4 mesh.
set -euo pipefail
cd "$(dirname "$0")/../.."
MODEL=${MODEL:-checkpoints/qwen-image-edit}

# Vanilla (dense 28-step) baseline
python -m regione_tpu.cli.main \
    --backend qwen-image-edit \
    --model_path "$MODEL" \
    --num_inference_steps 28 \
    --guidance_scale 4.0 \
    --seed 110 \
    --device tpu \
    --int4 \
    --image_path assets/data.jsonl \
    --output_dir result/Qwen-Image-Edit/Pretrain

# RegionE demo
python -m regione_tpu.cli.main \
    --backend qwen-image-edit \
    --model_path "$MODEL" \
    --num_inference_steps 28 \
    --use_regione \
    --warmup_step 6 \
    --post_step 2 \
    --refresh_step "16" \
    --threshold 0.80 \
    --cache_threshold 0.03 \
    --erosion_dilation \
    --guidance_scale 4.0 \
    --seed 110 \
    --device tpu \
    --int4 \
    --image_path assets/data.jsonl \
    --output_dir result/Qwen-Image-Edit/Demo/RegionE

# Evaluation over preprocessed GEdit-Bench
python -m regione_tpu.cli.main \
    --backend qwen-image-edit \
    --model_path "$MODEL" \
    --num_inference_steps 28 \
    --use_regione \
    --warmup_step 6 \
    --post_step 2 \
    --refresh_step "16" \
    --threshold 0.80 \
    --cache_threshold 0.03 \
    --erosion_dilation \
    --guidance_scale 4.0 \
    --seed 110 \
    --device tpu \
    --int4 \
    --evaluation \
    --image_path data/Processed/GEdit-Bench \
    --output_dir result/Qwen-Image-Edit/RegionE
