#!/bin/bash
# L2P prompt-pool learning over the ViT backbone (reference scripts/l2p.sh;
# the reference launches it as method "er" + model "l2p", here the l2p
# trainer is registered directly).
# Usage: scripts/l2p.sh [dataset] [seeds...]

DATASET="${1:-cifar100}"; shift || true
SEEDS=("${@:-1}")

METHOD="l2p"
N_TASKS=5; N=50; M=10

case "$DATASET" in
  cifar100|tinyimagenet|imagenet-r)
    MEM_SIZE=0; ONLINE_ITER=3; MODEL_NAME="vit_base_patch16_224"
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
