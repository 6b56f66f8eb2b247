#!/usr/bin/env bash
# Multi-host TPU pod-slice training.
# Capability parity: the reference's (gitignored) torchrun DDP launchers
# (src/.gitignore:9-10) — replaced by jax.distributed: run this same script
# on every host of the slice (e.g. via `gcloud compute tpus tpu-vm ssh
# --worker=all --command=...`); JAX discovers the slice topology from the
# TPU runtime, and the framework shards data per-process automatically
# (loader shard_index=process_index).
set -euo pipefail

export IB_MULTIHOST=1
exec python main.py train \
  --dataset-home "${DATASET_HOME:-../data}" \
  --checkpoint-dir "${CHECKPOINT_DIR:-../checkpoints}" \
  --model-type "${MODEL:-feedforward}" \
  --batch-size "${BATCH_SIZE:-4096}" \
  "$@"
