#!/usr/bin/env bash
# DeepFashion inference + scoring (mirrors reference run_DF_test.sh):
# conditional transfer (1001), factor sampling (1002), score.
set -euo pipefail
DATA_DIR=${1:?usage: run_DF_test.sh <data_dir> <log_dir>}
LOG_DIR=${2:?}
DATASET=DF_test_data

stage1=$(ls -d "$LOG_DIR"/df_stage1/ckpt/step_* | tail -1)
poseae=$(ls -d "$LOG_DIR"/df_poseae/ckpt/step_* | tail -1)
appsample=$(ls -d "$LOG_DIR"/df_appsample/ckpt/step_* | tail -1)
posesample=$(ls -d "$LOG_DIR"/df_posesample/ckpt/step_* | tail -1)

common=(--dataset="$DATASET" --data_dir="$DATA_DIR" --is_train=false
        --img_H=256 --img_W=256 --batch_size=16
        --pretrained_path="$stage1" --pretrained_poseAE_path="$poseae"
        --pretrained_appSample_path="$appsample"
        --pretrained_poseSample_path="$posesample")

# 1001: conditional pose transfer (ref: 400x16)
python main.py --model=1001 "${common[@]}" --model_dir="$LOG_DIR/df_test1001"
python -m dpig_tpu.eval.score 1 "$LOG_DIR/df_test1001" test_result
python -m dpig_tpu.eval.score 1 "$LOG_DIR/df_test1001" test_result --mask

# 1002: appearance/pose factor sampling (ref: 100x16)
python main.py --model=1002 "${common[@]}" --sample_fg=true \
    --test_batch_num=100 --model_dir="$LOG_DIR/df_test1002"
