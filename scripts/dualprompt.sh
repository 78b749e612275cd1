#!/bin/bash
# DualPrompt g/e-prompt learning over the ViT backbone (reference
# scripts/dualprompt.sh; launched there as method "er" + model
# "dualprompt"). Per-dataset memory sizes follow the reference blocks.
# Usage: scripts/dualprompt.sh [dataset] [seeds...]

DATASET="${1:-cifar100}"; shift || true
SEEDS=("${@:-1}")

METHOD="dualprompt"
N_TASKS=5; N=50; M=10

case "$DATASET" in
  cifar100)
    MEM_SIZE=0; ONLINE_ITER=3; MODEL_NAME="vit_base_patch16_224"
    EVAL_PERIOD=1000; BATCHSIZE=64; LR=5e-3; OPT_NAME="adam"
    SCHED_NAME="default" ;;
  tinyimagenet|imagenet-r)
    MEM_SIZE=2000; ONLINE_ITER=3; MODEL_NAME="vit_base_patch16_224"
    EVAL_PERIOD=1000; BATCHSIZE=64; LR=5e-3; OPT_NAME="adam"
    SCHED_NAME="default" ;;
  synthetic-*)
    MEM_SIZE=0; ONLINE_ITER=1; MODEL_NAME="vit_base_patch16_224"
    EVAL_PERIOD=200; BATCHSIZE=16; LR=1e-3; OPT_NAME="adam"
    SCHED_NAME="default" ;;
  *) echo "Undefined setting"; exit 1 ;;
esac

for seed in "${SEEDS[@]}"; do
  python -m lifelong_clip_tpu.main \
    --method "$METHOD" --dataset "$DATASET" \
    --n_tasks $N_TASKS --n $N --m $M --rnd_NM \
    --model_name "$MODEL_NAME" --batchsize $BATCHSIZE --lr $LR \
    --opt_name "$OPT_NAME" --sched_name "$SCHED_NAME" \
    --online_iter $ONLINE_ITER --eval_period $EVAL_PERIOD \
    --memory_size $MEM_SIZE \
    --seed "$seed" --rnd_seed "$seed"
done
