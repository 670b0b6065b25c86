#!/bin/sh
# Offline RTF grid (spec: reference scripts/benchmark_performance_gridsearch.sh)
for B in 1 8 32 64 128; do
  for T in 1.0 6.0 15.0; do
    python -m convasr_tpu.cli.benchmark -B "$B" -T "$T" --iterations 10 --output-tsv data/benchmark.tsv "$@"
  done
done
