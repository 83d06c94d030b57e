#!/bin/bash
set -e
python test.py --dataroot __synthetic__ --dataset_mode synthetic \
    --model nemar --name nemar_synthetic --num_test 16 "$@"
