#!/usr/bin/env bash
# Market-1501 inference + scoring (mirrors reference run_market_test.sh):
# full sampling (11), pose transfer (12), per-factor sampling (13), score.
# Usage: scripts/run_market_test.sh <data_dir> <log_dir>
set -euo pipefail
DATA_DIR=${1:?usage: run_market_test.sh <data_dir> <log_dir>}
LOG_DIR=${2:?}
DATASET=Market_test_data

stage1=$(ls -d "$LOG_DIR"/market_stage1/ckpt/step_* | tail -1)
poseae=$(ls -d "$LOG_DIR"/market_poseae/ckpt/step_* | tail -1)
appsample=$(ls -d "$LOG_DIR"/market_appsample/ckpt/step_* | tail -1)
posesample=$(ls -d "$LOG_DIR"/market_posesample/ckpt/step_* | tail -1)

common=(--dataset="$DATASET" --data_dir="$DATA_DIR" --is_train=false
        --img_H=128 --img_W=64 --batch_size=32
        --pretrained_path="$stage1" --pretrained_poseAE_path="$poseae"
        --pretrained_appSample_path="$appsample"
        --pretrained_poseSample_path="$posesample")

# Model 11: virtual person sampling (ref: sample_app + one_app_per_batch)
python main.py --model=11 "${common[@]}" --sample_app=true \
    --one_app_per_batch=true --model_dir="$LOG_DIR/market_test11"

# Model 12: conditional pose transfer -> score.txt
python main.py --model=12 "${common[@]}" --model_dir="$LOG_DIR/market_test12"
python -m dpig_tpu.eval.score 1 "$LOG_DIR/market_test12" test_result
python -m dpig_tpu.eval.score 1 "$LOG_DIR/market_test12" test_result --mask

# Model 13: per-factor sampling (vary FG only)
python main.py --model=13 "${common[@]}" --sample_fg=true \
    --model_dir="$LOG_DIR/market_test13"
