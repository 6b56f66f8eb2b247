#!/usr/bin/env bash
# Single-host TPU training run.
# Capability parity: the reference's SLURM wrappers (src/slurm/slurm_example.sh)
# — resource selection + main.py invocation — translated to a TPU VM.
set -euo pipefail

DATASET_HOME="${DATASET_HOME:-../data}"
CHECKPOINT_DIR="${CHECKPOINT_DIR:-../checkpoints}"
MODEL="${MODEL:-feedforward}"

# DOCTOR=1: gate the run on backend health (compile-latency + transfer
# probes; `main.py doctor` exits 1 when the backend looks degraded)
if [[ "${DOCTOR:-0}" == "1" ]]; then
  python main.py doctor || { echo "backend degraded — not launching"; exit 1; }
fi

exec python main.py train \
  --dataset-home "$DATASET_HOME" \
  --checkpoint-dir "$CHECKPOINT_DIR" \
  --model-type "$MODEL" \
  --history-len 50 --stride 5 \
  --batch-size "${BATCH_SIZE:-4096}" \
  --epochs "${EPOCHS:-10}" \
  --opt-type "${OPT:-rmsprop}" --learning-rate "${LR:-1e-4}" \
  "$@"
