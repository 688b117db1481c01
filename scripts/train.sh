#!/bin/bash
# CSNet training wrapper (reference CSF+Res2Net/train.sh counterpart).
set -e
CONFIG=${1:-/root/reference/CSNet_training/configs/csnet-L-x2_train.yml}
python -m cli.train --config "$CONFIG" "${@:2}"
