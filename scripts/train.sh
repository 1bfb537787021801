#!/usr/bin/env bash
# Train the basic model (ref scripts/train_script.sh) — single host; add
# --multihost under a multi-process TPU launcher.
set -e
python -m gfnet_tpu.cli.train \
    --conf_path gfnet_tpu/configs/basic.json \
    --dataset "${1:-googlemap}" \
    --gpu_batch_size "${2:-8}" \
    --data_path "${DATA_PATH:-data}"
