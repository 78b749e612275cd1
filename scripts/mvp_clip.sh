#!/bin/bash
# MVP-CLIP (mask + visual prompts) online CL (reference scripts/mvp_clip.sh).
DATASET="${1:-imagenet-r}"; shift || true
SEEDS=("${@:-1}")
for seed in "${SEEDS[@]}"; do
  python -m lifelong_clip_tpu.main \
    --method mvp-clip --dataset "$DATASET" \
    --n_tasks 5 --n 50 --m 10 --rnd_NM \
    --model_name "ViT-B/16" --batchsize 64 --lr 5e-4 \
    --opt_name adamw --online_iter 3 --eval_period 1000 \
    --use_mask --use_contrastiv \
    --seed "$seed" --rnd_seed "$seed"
done
