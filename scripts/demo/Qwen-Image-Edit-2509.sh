#!/usr/bin/env bash
# Vanilla + demo + evaluation driver for Qwen-Image-Edit-2509 (Plus) —
# TPU equivalent of the reference script/Qwen-Image-Edit-2509.sh.  Extra
# reference images go in via repeated --ref_image_path (the reference CLI
# is single-ref only, src/Qwen-Image-Edit-2509/main.py:1).
set -euo pipefail
cd "$(dirname "$0")/../.."
MODEL=${MODEL:-checkpoints/qwen-image-edit-2509}

python -m regione_tpu.cli.main \
    --backend qwen-image-edit-plus \
    --model_path "$MODEL" \
    --num_inference_steps 28 \
    --guidance_scale 4.0 \
    --seed 110 \
    --device tpu \
    --int4 \
    --image_path assets/data.jsonl \
    --output_dir result/Qwen-Image-Edit-2509/Pretrain

python -m regione_tpu.cli.main \
    --backend qwen-image-edit-plus \
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
    --output_dir result/Qwen-Image-Edit-2509/Demo/RegionE

python -m regione_tpu.cli.main \
    --backend qwen-image-edit-plus \
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
    --output_dir result/Qwen-Image-Edit-2509/RegionE
