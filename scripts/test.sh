#!/bin/sh
# Eval-only CPU smoke run on a micro valset (spec: reference scripts/test.sh)
set -e
JAX_PLATFORMS=cpu python -m convasr_tpu.cli.train "$@" \
  --checkpoint "$CHECKPOINT" \
  --val-data-path data/kontur_calls_micro.csv.json
