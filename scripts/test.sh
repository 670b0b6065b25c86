#!/bin/sh
# Eval-only CPU smoke run on a micro valset (spec: reference scripts/test.sh)
set -e
python -m convasr_tpu.cli.train "$@" \
  --device cpu \
  --checkpoint "$CHECKPOINT" \
  --val-data-path data/kontur_calls_micro.csv.json
