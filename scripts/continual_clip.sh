#!/bin/bash
# Zero-shot frozen CLIP on a Si-Blurry stream (reference scripts/continual_clip.sh).
DATASET="${1:-mnist}"; shift || true
python -m lifelong_clip_tpu.main \
  --method continual-clip --dataset "$DATASET" \
  --n_tasks 5 --n 50 --m 10 \
  --model_name "ViT-B/16" --test_batchsize 128 --eval_period 1000 \
  "$@"
