#!/bin/bash
# CLI-driven two-stage quality run under the supervisor: the production
# entry path end-to-end (train.py + YAML configs + --supervise + the
# stall_timeout watchdog armed), best-known settings (aligned_aug +
# r1_gamma), short peak-targeted schedule (aligned stage-1 peaks ~e12,
# stage-2 ~e1-3 on this corpus).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
python -u train.py --config .runs/qcli/hd1.yaml --mode train --supervise 2
python -u train.py --config .runs/qcli/hd2.yaml --mode train_test --supervise 2
