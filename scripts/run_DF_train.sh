#!/usr/bin/env bash
# DeepFashion 256x256 training pipeline (mirrors reference run_DF_train.sh).
# Usage: scripts/run_DF_train.sh <data_dir> [log_dir]
set -euo pipefail
DATA_DIR=${1:?usage: run_DF_train.sh <data_dir> [log_dir]}
LOG_DIR=${2:-logs}
DATASET=DF_train_data

common=(--dataset="$DATASET" --data_dir="$DATA_DIR" --log_dir="$LOG_DIR"
        --img_H=256 --img_W=256)

# Stage-I appearance (ref: bs6, 120k steps)
python main.py --model=101 "${common[@]}" --batch_size=6 \
    --g_lr=2e-5 --d_lr=2e-5 --max_step=120000 --lr_update_step=50000 \
    --model_dir="$LOG_DIR/df_stage1"

# Pose AE (ref: bs16, 120k)
python main.py --model=102 "${common[@]}" --batch_size=16 \
    --g_lr=2e-5 --max_step=120000 --lr_update_step=50000 \
    --model_dir="$LOG_DIR/df_poseae"

# App sampler — single 7*32-d mapper (ref: bs16, 120k)
python main.py --model=103 "${common[@]}" --batch_size=16 \
    --g_lr=2e-5 --d_lr=2e-5 --max_step=120000 --lr_update_step=50000 \
    --pretrained_path="$(ls -d "$LOG_DIR"/df_stage1/ckpt/step_* | tail -1)" \
    --model_dir="$LOG_DIR/df_appsample"

# Pose sampler (ref: bs32, 60k)
python main.py --model=104 "${common[@]}" --batch_size=32 \
    --g_lr=2e-5 --d_lr=2e-5 --max_step=60000 --lr_update_step=50000 \
    --pretrained_path="$(ls -d "$LOG_DIR"/df_stage1/ckpt/step_* | tail -1)" \
    --pretrained_poseAE_path="$(ls -d "$LOG_DIR"/df_poseae/ckpt/step_* | tail -1)" \
    --model_dir="$LOG_DIR/df_posesample"
