#!/bin/sh
# Smoke training run: 10 iterations, no checkpoints (spec: reference scripts/train.sh)
python -m convasr_tpu.cli.train "$@" \
  --model JasperNetBig \
  --train-batch-size 4 --val-batch-size 64 \
  --scheduler MultiStepLR --decay-milestones 25000 75000 \
  --lr 1e-2 \
  --optimizer NovoGrad \
  --train-data-path data/mixed_train.csv.json \
  --val-iteration-interval 2500 \
  --val-data-path data/clean_val.csv.json \
  --epochs 3 --experiment-id debug --checkpoint-skip --iterations 10
