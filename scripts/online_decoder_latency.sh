#!/usr/bin/env bash
# Online (unary) latency for the ACCURATE decoders (VERDICT r4 #6).
#
# Measures p50/p99 at 5/20/50 rps for greedy vs device beam vs hybrid
# (device beam + host CNLM rescore) vs host C++ beam, through the real
# benchmark_online request loop (B=1, T=6 s, int16 LINEAR16 ingest,
# bf16 JasperNetBig). Run scripts/tunnel_probe.py first and only keep
# numbers from a sane window (floor <= ~35 ms).
#
# Usage: LM=/tmp/ladder_full/word.binlm bash scripts/online_decoder_latency.sh
set -u
LM=${LM:-/tmp/ladder_full/word.binlm}
DUR=${DUR:-30}
OUT=${OUT:-/tmp/online_decoder_latency.log}

echo "== tunnel gate ==" | tee "$OUT"
timeout 300 python scripts/tunnel_probe.py 2>&1 | tail -2 | tee -a "$OUT"

run() {
  local name="$1"; shift
  for rps in 5 20 50; do
    echo "== $name rps=$rps ==" | tee -a "$OUT"
    timeout 900 python -m convasr_tpu.cli.benchmark_online \
      --input-dtype int16 -T 6.0 --rps "$rps" \
      --benchmark-duration "$DUR" --warmup-iterations 5 "$@" 2>&1 \
      | grep -E "Latency|too slow" | tee -a "$OUT"
  done
}

run greedy
run device-beam16 --decoder BeamSearchDecoderDevice --beam-width 16
run hybrid-beam16-cnlm --decoder BeamSearchDecoderDeviceLM --beam-width 16 \
    --lm "$LM"
run host-beam32-cnlm --decoder BeamSearchDecoder --beam-width 32 --lm "$LM"

echo "done; results in $OUT"
