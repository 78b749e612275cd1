#!/bin/bash
# Adapter-CLIP online CL (reference scripts/adapter_clip.sh).
DATASET="${1:-tinyimagenet}"; shift || true
SEEDS=("${@:-1}")
for seed in "${SEEDS[@]}"; do
  python -m lifelong_clip_tpu.main \
    --method adapter-clip --dataset "$DATASET" \
    --n_tasks 5 --n 50 --m 10 --rnd_NM \
    --model_name "ViT-B/16" --batchsize 64 --lr 5e-4 \
    --opt_name adamw --online_iter 3 --eval_period 1000 \
    --peft_encoder image --visible_classes all \
    --seed "$seed" --rnd_seed "$seed"
done
