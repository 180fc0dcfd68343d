#!/usr/bin/env bash
# 1-epoch CPU/TPU smoke test — parity with the reference TEST_CAPE.sh
# (1 epoch x 5 episodes). Uses the synthetic fixture when DATASET_ROOT is
# unset, so it runs hermetically.
set -euo pipefail

if [[ -z "${DATASET_ROOT:-}" ]]; then
  echo "DATASET_ROOT unset -> generating synthetic MP-100 fixture"
  DATASET_ROOT=$(python - <<'PY'
import tempfile
from cape_tpu.data.synthetic import make_synthetic_mp100
root = tempfile.mkdtemp(prefix="mp100_synth_")
make_synthetic_mp100(root, num_categories=6, images_per_category=6)
print(root)
PY
)
  export DATASET_ROOT
  SPLIT_FILE="$DATASET_ROOT/category_splits.json"
  EXTRA=(--category_split_file "$SPLIT_FILE" --image_size 64 \
         --hidden_dim 64 --dim_feedforward 128 --enc_layers 2 --dec_layers 2 \
         --nheads 4 --seq_len 24 --vocab_size 100 --backbone resnet_tiny \
         --no_bf16)
else
  EXTRA=()
fi

python -m cape_tpu.cli.train \
  --dataset_root "$DATASET_ROOT" \
  --output_dir "${OUTPUT_DIR:-output/test_cape}" \
  --epochs 1 --episodes_per_epoch 5 --batch_size 1 --accumulation_steps 1 \
  --warmup_epochs 0 --val_episodes_per_epoch 3 --num_queries_per_episode 1 \
  --print_freq 1 "${EXTRA[@]}"
echo "TEST_CAPE: OK"
