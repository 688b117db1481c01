#!/bin/bash
# Batch CSF inference over the six benchmark sets (reference forward.sh).
set -e
MODEL=${1:?usage: forward.sh <checkpoint> [test_fold]}
FOLD=${2:-results/maps}
for MODE in e p d h s t; do
  python -m cli.csf --mode test --model "$MODEL" --sal_mode "$MODE" \
      --test_fold "$FOLD/$MODE"
done
