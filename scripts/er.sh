#!/bin/bash
# Experience replay baseline (reference scripts/er.sh).
DATASET="${1:-cifar10}"; shift || true
python -m lifelong_clip_tpu.main \
  --method er --dataset "$DATASET" \
  --n_tasks 5 --n 50 --m 10 \
  --batchsize 16 --temp_batchsize 8 --memory_size 500 \
  --lr 3e-4 --opt_name adamw --online_iter 1 --eval_period 1000 \
  "$@"
