#!/usr/bin/env bash
# Canonical training launcher — TPU equivalent of the reference
# START_CAPE_TRAINING.sh: env checks + quick/normal hyperparameter sets.
#
# Usage:
#   DATASET_ROOT=/path/to/mp100 ./START_CAPE_TRAINING.sh          # full run
#   DATASET_ROOT=/path/to/mp100 ./START_CAPE_TRAINING.sh quick    # smoke run
set -euo pipefail

DATASET_ROOT="${DATASET_ROOT:?set DATASET_ROOT to the MP-100 root}"
OUTPUT_DIR="${OUTPUT_DIR:-output/cape_episodic}"
MODE="${1:-normal}"

python - <<'PY'
import jax
devs = jax.devices()
print(f"JAX backend: {devs[0].platform} with {len(devs)} device(s): {devs}")
PY

if [[ "$MODE" == "quick" ]]; then
  echo "Quick mode: 5 epochs x 100 episodes, batch 1"
  exec python -m cape_tpu.cli.train \
    --dataset_root "$DATASET_ROOT" \
    --output_dir "$OUTPUT_DIR" \
    --epochs 5 --episodes_per_epoch 100 --batch_size 1 \
    --accumulation_steps 1 --warmup_epochs 1 \
    --val_episodes_per_epoch 50
else
  echo "Normal mode: 300 epochs x 1000 episodes, batch 2 x acc 4"
  exec python -m cape_tpu.cli.train \
    --dataset_root "$DATASET_ROOT" \
    --output_dir "$OUTPUT_DIR" \
    --epochs 300 --episodes_per_epoch 1000 --batch_size 2 \
    --accumulation_steps 4
fi
