#!/bin/bash
# Full-width training throughput at reference batch sizes (VERDICT r3 #4).
#
# Runs the REAL train CLI (JasperNetBig, full width, dropout 0.2, rbg PRNG,
# --device-cache so steps are indices-only through the tunnel,
# --steps-per-dispatch to amortize the dispatch roundtrips) at
# B in {64, 128, 256, 512} x 6 s utterances and reports sustained ms/step.
# Reference operating points: scripts/train.sh bs=256, spotty.yaml:29 bs<=1024.
#
# Usage: bash scripts/train_scaling.sh [/tmp/scaling_corpus] [--remat]
set -e
CORPUS=${1:-/tmp/scaling_corpus}
REMAT=${2:-}

if [ ! -f "$CORPUS/train.json" ]; then
  python - "$CORPUS" << 'EOF'
import json, os, sys
import numpy as np
import jax; jax.config.update('jax_platforms', 'cpu')
from convasr_tpu.audio import write_audio
root = sys.argv[1]
os.makedirs(root, exist_ok=True)
sr, dur = 8000, 6.0
rng = np.random.RandomState(0)
entries = []
for i in range(640):  # >= 512 rows in the single 6-s bucket
    p = f'{root}/u{i:04d}.wav'
    write_audio(p, (0.1 * rng.randn(1, int(sr * dur))).astype(np.float32), sr)
    entries.append(dict(audio_path=p, ref=['привет мир', 'мир труд май'][i % 2],
                        begin=0.0, end=dur))
json.dump(entries, open(f'{root}/train.json', 'w'), ensure_ascii=False)
json.dump(entries[:8], open(f'{root}/val.json', 'w'), ensure_ascii=False)
print('corpus ready:', root)
EOF
fi

for B in 64 128 256 512; do
  EXP=/tmp/scaling_exp_b$B
  rm -rf $EXP
  echo "=== B=$B $REMAT ==="
  timeout 1500 python -m convasr_tpu.cli.train \
    --model JasperNetBig --num-input-features 64 \
    --train-data-path $CORPUS/train.json --val-data-path $CORPUS/val.json \
    --experiments-dir $EXP --experiment-id scale \
    --train-batch-size $B --val-batch-size 8 \
    --iterations 24 --log-iteration-interval 1 --val-iteration-interval 0 \
    --epochs 100 --optimizer NovoGrad --lr 1e-2 --dropout 0.2 \
    --batch-time-padding-multiple 128 \
    --device-cache --steps-per-dispatch 8 --prng rbg --checkpoint-skip \
    --text-config configs/ru_text_config.json \
    --val-config configs/ru_val_config.json $REMAT 2>&1 \
    | grep -E "step |cache|OOM|RESOURCE" | tail -6
  python - $EXP/scale/log.txt $B << 'EOF'
import datetime, re, sys
# sustained wall rate from the iter-line timestamps over the run's second
# half (the per-line 'step' field is per-dispatch-group, not per-iteration,
# under --steps-per-dispatch)
rows = []
for l in open(sys.argv[1]):
    m = re.match(r'(\S+ \S+?),\d+ .*iter (\d+) loss', l)
    if m:
        rows.append((datetime.datetime.strptime(m.group(1), '%Y-%m-%d %H:%M:%S'),
                     int(m.group(2))))
if len(rows) >= 4:
    (t0, i0), (t1, i1) = rows[len(rows) // 2], rows[-1]
    if i1 > i0:
        ms = (t1 - t0).total_seconds() * 1e3 / (i1 - i0)
        b = int(sys.argv[2])
        print(f'B={b}: sustained {ms:.0f} ms/step = '
              f'{b * 6.0 / (ms / 1e3):.0f} audio-s/s')
EOF
done
