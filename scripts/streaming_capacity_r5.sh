#!/usr/bin/env bash
# Clean-window streaming capacity, PRODUCTION config (VERDICT r4 #4):
# mu-law wire + uint8-packed beam tail fetch + beam+LM(CNLM) finals,
# int8 fused tick, at 256/320/384 slots — replaces the stale r3 number
# (f16 tail, degraded window, no LM). Also reports endpoint->final commit
# latency percentiles under load.
#
# Gate on scripts/tunnel_probe.py (floor <= ~35 ms) and NEVER run
# concurrently with anything else on the chip. p50 is the robust tick stat
# (ticks 0-1 pay a ~2-2.7 s executable install even warm).
#
# Usage: LM=/tmp/ladder_full/word.binlm bash scripts/streaming_capacity_r5.sh
set -u
LM=${LM:-/tmp/ladder_full/word.binlm}
DUR=${DUR:-45}
OUT=${OUT:-/tmp/streaming_capacity_r5.log}

echo "== tunnel gate ==" | tee "$OUT"
timeout 300 python scripts/tunnel_probe.py 2>&1 | tail -2 | tee -a "$OUT"

for slots in 256 320 384; do
  echo "== production config, slots=$slots ==" | tee -a "$OUT"
  timeout 1200 python -m convasr_tpu.cli.benchmark_online \
    --streaming --streaming-engine batched --streaming-dispatch fused \
    --streams "$slots" --chunk-sec 0.32 --window-sec 10 --lookahead-sec 1.5 \
    --streaming-transport mulaw --streaming-beam-topk 8 \
    --streaming-beam-width 16 --streaming-lm "$LM" \
    --streaming-beam-force-final-sec 5 \
    --quantize int8 --calibration-cache data/bench_act_scales.npz \
    --benchmark-duration "$DUR" 2>&1 \
    | grep -E "latency|budget|streams|warning" | tee -a "$OUT"
done

# carried device-beam INTERIMS capacity cost (VERDICT r4 #9) at 128 slots:
# greedy interims vs beam-quality interims, same engine otherwise
for interim in 0 8; do
  echo "== beam-interim=$interim slots=128 ==" | tee -a "$OUT"
  timeout 1200 python -m convasr_tpu.cli.benchmark_online \
    --streaming --streaming-engine batched --streaming-dispatch fused \
    --streams 128 --chunk-sec 0.32 --window-sec 10 --lookahead-sec 1.5 \
    --streaming-transport mulaw --streaming-beam-interim "$interim" \
    --quantize int8 --calibration-cache data/bench_act_scales.npz \
    --benchmark-duration "$DUR" 2>&1 \
    | grep -E "latency|budget|streams|warning" | tee -a "$OUT"
done

echo "done; results in $OUT"
