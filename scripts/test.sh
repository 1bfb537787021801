#!/usr/bin/env bash
# Evaluate a checkpoint (ref scripts/test_script.sh).
set -e
python -m gfnet_tpu.cli.test \
    --conf_path gfnet_tpu/configs/basic.json \
    --dataset "${1:-mscoco}" \
    --ckpt_path "${2:-}" \
    --data_path "${DATA_PATH:-data}"
