#!/bin/bash
# Smoke-train NeMAR on the built-in synthetic misaligned-multimodal data.
set -e
python train.py --dataroot __synthetic__ --dataset_mode synthetic \
    --model nemar --stn_type "${1:-unet}" --name nemar_synthetic \
    --batch_size 16 --n_epochs 20 --n_epochs_decay 20 --bf16 \
    --print_freq 64 --display_freq 256 "$@"
