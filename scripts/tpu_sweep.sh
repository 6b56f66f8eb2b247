#!/usr/bin/env bash
# Hyperparameter sweep over learning rates / hidden dims.
# Capability parity: reference src/slurm/slurm_loop.sh:13-22 (bash-loop sweep).
set -euo pipefail

DATASET_HOME="${DATASET_HOME:-../data}"
CHECKPOINT_ROOT="${CHECKPOINT_ROOT:-../sweeps}"

for lr in 1e-3 1e-4 1e-5; do
  for hidden in "512 512" "1024 1024" "256 256 256"; do
    tag="lr${lr}_h$(echo "$hidden" | tr ' ' x)"
    echo "=== sweep $tag ==="
    WANDB_RUN_GROUP="sweep_$tag" python main.py train \
      --dataset-home "$DATASET_HOME" \
      --checkpoint-dir "$CHECKPOINT_ROOT/$tag" \
      --model-type feedforward \
      --learning-rate "$lr" \
      --hidden-dims $hidden \
      --epochs "${EPOCHS:-5}" "$@"
  done
done
