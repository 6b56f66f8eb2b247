#!/usr/bin/env bash
# Hyperparameter sweep over learning rates / seeds / hidden dims.
# Capability parity: reference src/slurm/slurm_loop.sh:13-22 (bash-loop
# sweep, one sbatch job per point). TPU-native upgrade: `main.py sweep`
# trains the whole lr x seed grid SIMULTANEOUSLY in one compiled program
# (vmapped config axis; 16 configs measured at 2.7x the throughput of
# sequential runs — BENCH_NOTES.md); hidden-dim shapes run sequentially
# around it.
set -euo pipefail

DATASET_HOME="${DATASET_HOME:-../data}"
CHECKPOINT_ROOT="${CHECKPOINT_ROOT:-../sweeps}"

python main.py sweep \
  --dataset-home "$DATASET_HOME" \
  --checkpoint-dir "$CHECKPOINT_ROOT" \
  --model-type feedforward \
  --lrs 1e-3 1e-4 1e-5 \
  --seeds 0 1 2 \
  --hidden-dims-grid "512,512" "1024,1024" "256,256,256" \
  --epochs "${EPOCHS:-5}" "$@"
# results: $CHECKPOINT_ROOT/sweep/feedforward/sweep_results.json (ranked,
# with per-config dev curves) + one loadable checkpoint per config
