#!/usr/bin/env bash
# K-fold cross-validation over the 5 official MP-100 splits.
# TPU equivalent of the reference `scripts/run_kfold_cross_validation.sh`:
# trains + evaluates each fold sequentially, then aggregates mean±std PCK.
#
# Usage:
#   DATASET_ROOT=/path/to/mp100 ./scripts/run_kfold_cross_validation.sh [quick]
#
# Env overrides: OUTPUT_ROOT, SPLITS ("1 2 3 4 5"), EVAL_EPISODES,
# EXTRA_TRAIN_ARGS / EXTRA_EVAL_ARGS (extra CLI flags appended last, so
# they win over the mode defaults — the hermetic k-fold test uses these to
# shrink the model for CPU).
set -euo pipefail

DATASET_ROOT="${DATASET_ROOT:?set DATASET_ROOT to the MP-100 root}"
OUTPUT_ROOT="${OUTPUT_ROOT:-output/kfold}"
SPLITS="${SPLITS:-1 2 3 4 5}"
MODE="${1:-full}"

if [[ "$MODE" == "quick" ]]; then
  TRAIN_ARGS=(--epochs 1 --episodes_per_epoch 20 --batch_size 1 \
              --val_episodes_per_epoch 10 --warmup_epochs 0)
  EVAL_EPISODES="${EVAL_EPISODES:-20}"
else
  TRAIN_ARGS=(--epochs 300 --episodes_per_epoch 1000 --batch_size 2 \
              --accumulation_steps 4)
  EVAL_EPISODES="${EVAL_EPISODES:-200}"
fi
# shellcheck disable=SC2206 — intentional word splitting of extra flags
TRAIN_ARGS+=(${EXTRA_TRAIN_ARGS:-})
EVAL_ARGS=(${EXTRA_EVAL_ARGS:-})

for SPLIT in $SPLITS; do
  FOLD_DIR="$OUTPUT_ROOT/fold_$SPLIT"
  echo "=== Fold $SPLIT -> $FOLD_DIR ==="
  python -m cape_tpu.cli.train \
    --dataset_root "$DATASET_ROOT" \
    --mp100_split "$SPLIT" \
    --output_dir "$FOLD_DIR" \
    "${TRAIN_ARGS[@]}"

  BEST=$(python - "$FOLD_DIR" <<'PY'
import sys
from cape_tpu.utils.checkpoint import CheckpointManager
m = CheckpointManager(sys.argv[1])
print(m.best() or m.latest() or "")
PY
)
  if [[ -z "$BEST" ]]; then
    echo "No checkpoint produced for fold $SPLIT" >&2
    exit 1
  fi
  python -m cape_tpu.cli.evaluate \
    --checkpoint "$BEST" \
    --dataset_root "$DATASET_ROOT" \
    --split test \
    --num_episodes "$EVAL_EPISODES" \
    --output_dir "$FOLD_DIR" \
    "${EVAL_ARGS[@]}"
done

python scripts/aggregate_kfold_results.py --results_dir "$OUTPUT_ROOT" \
  --splits $SPLITS --eval_split test
