#!/bin/bash
# LoRA-CLIP online CL on a Si-Blurry stream (reference scripts/lora_clip.sh).
# Usage: scripts/lora_clip.sh [dataset] [seeds...]

DATASET="${1:-cifar100}"; shift || true
SEEDS=("${@:-1}")

METHOD="lora-clip"
PEFT_ENCODER="both"     # both, text, image
N_TASKS=5; N=50; M=10
VIS_CLASS="all"
MEM_SIZE=0

case "$DATASET" in
  cifar100|tinyimagenet|imagenet-r)
    ONLINE_ITER=3; MODEL_NAME="ViT-B/16"; EVAL_PERIOD=1000
    BATCHSIZE=64; LR=5e-4; OPT_NAME="adamw"; SCHED_NAME="default" ;;
  synthetic-*)
    ONLINE_ITER=1; MODEL_NAME="ViT-B/16"; EVAL_PERIOD=200
    BATCHSIZE=16; LR=1e-3; OPT_NAME="adamw"; SCHED_NAME="default" ;;
  *) echo "Undefined setting"; exit 1 ;;
esac

for seed in "${SEEDS[@]}"; do
  python -m lifelong_clip_tpu.main \
    --method "$METHOD" --dataset "$DATASET" \
    --n_tasks $N_TASKS --n $N --m $M --rnd_NM \
    --model_name "$MODEL_NAME" --batchsize $BATCHSIZE --lr $LR \
    --opt_name "$OPT_NAME" --sched_name "$SCHED_NAME" \
    --online_iter $ONLINE_ITER --eval_period $EVAL_PERIOD \
    --memory_size $MEM_SIZE --visible_classes "$VIS_CLASS" \
    --peft_encoder "$PEFT_ENCODER" --seed "$seed" --rnd_seed "$seed"
done
