#!/usr/bin/env bash
# Market-1501 training pipeline (mirrors reference run_market_train.sh):
# Stage-I appearance -> pose AE -> Stage-II app samplers -> pose sampler.
# Usage: scripts/run_market_train.sh <data_dir> [log_dir]
set -euo pipefail
DATA_DIR=${1:?usage: run_market_train.sh <data_dir> [log_dir]}
LOG_DIR=${2:-logs}
DATASET=Market_train_data

common=(--dataset="$DATASET" --data_dir="$DATA_DIR" --log_dir="$LOG_DIR"
        --img_H=128 --img_W=64)

# Stage-I appearance reconstruction (ref: bs16, 120k steps, lr 2e-5/50k)
python main.py --model=1 "${common[@]}" --batch_size=16 \
    --g_lr=2e-5 --d_lr=2e-5 --max_step=120000 --lr_update_step=50000 \
    --model_dir="$LOG_DIR/market_stage1"

# Stage-I pose autoencoder (ref: bs64, 60k steps)
python main.py --model=2 "${common[@]}" --batch_size=64 \
    --g_lr=2e-5 --max_step=60000 --lr_update_step=50000 \
    --model_dir="$LOG_DIR/market_poseae"

# Stage-II appearance samplers (ref: bs32, 120k steps, WGAN critic x5)
python main.py --model=3 "${common[@]}" --batch_size=32 \
    --g_lr=2e-5 --d_lr=2e-5 --max_step=120000 --lr_update_step=50000 \
    --pretrained_path="$(ls -d "$LOG_DIR"/market_stage1/ckpt/step_* | tail -1)" \
    --model_dir="$LOG_DIR/market_appsample"

# Stage-II pose sampler (ref: bs64, 60k steps, WGAN)
python main.py --model=4 "${common[@]}" --batch_size=64 \
    --g_lr=2e-5 --d_lr=2e-5 --max_step=60000 --lr_update_step=50000 \
    --pretrained_path="$(ls -d "$LOG_DIR"/market_stage1/ckpt/step_* | tail -1)" \
    --pretrained_poseAE_path="$(ls -d "$LOG_DIR"/market_poseae/ckpt/step_* | tail -1)" \
    --model_dir="$LOG_DIR/market_posesample"
