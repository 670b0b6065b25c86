#!/bin/sh
# B x T RTF grid (spec: reference scripts/benchmark_performance_gridsearch.sh
# sweeps B in {1..1024}, T in {10..3840 s}); appends one TSV row per point so
# off-hot-shape perf regressions are visible. Run on the real TPU, alone on
# the chip (CLAUDE.md: never two TPU benchmarks concurrently).
set -e
OUT="${1:-data/benchmark_grid.tsv}"
mkdir -p "$(dirname "$OUT")"
for B in 1 8 32 64 128 256; do
  for T in 1 6 15 60; do
    python -m convasr_tpu.cli.benchmark -B "$B" -T "$T" \
      --iterations 10 --warmup-iterations 2 --output-tsv "$OUT"
  done
done
echo "grid written to $OUT"
