#!/bin/bash
# 2x-corpus (48 patients x 15 slices, 512²) CLI-driven two-stage quality
# run: aligned_aug + r1_gamma=0.1 + fused_body_grad auto, stall watchdog +
# --supervise. Data-scaling follow-up to the r2d aligned runs.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
python -u .runs/q2x/setup.py
python -u train.py --config .runs/q2x/hd1.yaml --mode train --supervise 3
python -u train.py --config .runs/q2x/hd2.yaml --mode train_test --supervise 3
