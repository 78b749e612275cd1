#!/bin/bash
# CLIB: memory-only online CL with importance memory + adaptive LR
# (reference scripts/clib.sh hyperparameter blocks).
# Usage: scripts/clib.sh [dataset] [seeds...]

DATASET="${1:-cifar100}"; shift || true
SEEDS=("${@:-1}")

METHOD="clib"
N_TASKS=5; N=50; M=10

case "$DATASET" in
  cifar100|tinyimagenet|imagenet-r)
    # reference: vit_base, mem 2000, online_iter 3, lr 5e-3 adam
    MEM_SIZE=2000; ONLINE_ITER=3; MODEL_NAME="ViT-B/16"; EVAL_PERIOD=1000
    BATCHSIZE=64; LR=5e-3; OPT_NAME="adam"; SCHED_NAME="default" ;;
  synthetic-*)
    MEM_SIZE=64; ONLINE_ITER=1; MODEL_NAME="ViT-B/16"; EVAL_PERIOD=200
    BATCHSIZE=16; LR=1e-3; OPT_NAME="adam"; SCHED_NAME="default" ;;
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
    --lr_step 0.95 --lr_length 10 --lr_period 10 --imp_update_period 1 \
    --seed "$seed" --rnd_seed "$seed"
done
