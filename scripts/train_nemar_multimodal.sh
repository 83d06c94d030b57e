#!/bin/bash
# Train NeMAR on paired multimodal data: {dataroot}/trainA + trainB,
# paired by sorted filename, shared geometric augmentation.
set -e
DATAROOT=${1:?usage: train_nemar_multimodal.sh <dataroot> [extra flags]}
shift
python train.py --dataroot "$DATAROOT" --dataset_mode multimodal \
    --model nemar --stn_type unet --name nemar_multimodal --bf16 "$@"
