"""--adapt-bn evidence probe (VERDICT r2 missing #5).

BatchNorm running stats memorize the TRAIN-domain activation distribution;
on a domain-shifted val set (same tone-word grammar, different noise floor)
frozen stats mis-normalize every layer. `--adapt-bn` re-estimates them on
the val set before decoding (spec: reference train.py:182-186 +
models.py:726-733 reset_bn_running_stats_), which should cut WER.

Runs the REAL train CLI in eval-only mode (no --train-data-path) twice —
with and without --adapt-bn — against a freshly synthesized shifted-noise
val corpus, and reports both WERs. Pass --device axon (or omit for the
session default, the real chip) for the on-chip evidence run; --device cpu
for a local check.

Usage:
  python scripts/lm_wer_probe.py --tmp /tmp/lmwer_r3   # once, for the ckpt
  python scripts/adapt_bn_probe.py --checkpoint /tmp/lmwer_r3/exp/lmwer/<ck>
      [--val-noise 0.8] [--device cpu]

Formant-synthesis variant (VERDICT r3 #8 — source-filter phones instead of
sine tones; train WITH --edge-pad 0.3 so the val builder's boundary context
is in-domain and the only shift under test is noise+reverb):
  python scripts/lm_wer_probe.py --synth formant --noise 0.2 --edge-pad 0.3 \
      --tmp /tmp/lmwer_formant
  python scripts/adapt_bn_probe.py --synth formant --checkpoint <ck> \
      --val-noise 0.3 --val-reverb 0.12 --device cpu
Measured (2026-08-19, 600-iter formant checkpoint, train noise 0.2 +
edge-pad 0.3, val noise 0.3 + RT60 0.12): frozen-BN WER 19.44% ->
adapted-BN 15.00% (CER 11.94% -> 9.17%) on CPU.

Measured (2026-08-17, 600-iter tone-word checkpoint, train noise 0.4, val
noise 0.8): REAL CHIP frozen-BN WER 13.33% -> adapted-BN 11.11%; CPU 13.89%
-> 11.67%. Before the cumulative-average fix in train/loop.py the adapted
stats stayed dominated by the zero/unit reset (flax EMA momentum 0.9) and
scored 100% WER — pinned by test_train_integration.py::TestAdaptBn.
"""
import argparse
import importlib.util
import json
import pathlib
import re
import subprocess
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

spec = importlib.util.spec_from_file_location(
    'lm_wer_probe', ROOT / 'scripts' / 'lm_wer_probe.py')
probe = importlib.util.module_from_spec(spec)
spec.loader.exec_module(probe)


def build_val(tmp, noise, n=60, seed=7, reverb_rt60=0.0, edge_pad=0.3):
    # same grammar/phones as training, shifted noise floor (+ optional room
    # reverb in formant mode); fresh seed so no utterance is shared with the
    # training corpus. edge_pad MUST match training (see main: read from the
    # training corpus_meta.json) — a mismatch makes the BN re-estimation see
    # out-of-domain edge context and masquerades as domain shift.
    from convasr_tpu.audio import write_audio
    rng = np.random.RandomState(seed)
    entries = []
    for i in range(n):
        words = probe.sample_sentence(rng)
        wave = probe.synth_sentence(rng, words, noise, edge_pad=edge_pad)
        if reverb_rt60:
            from convasr_tpu.audio.synth import add_reverb
            wave = add_reverb(wave, probe.SR, reverb_rt60, rng)
        path = str(tmp / f'shift_{i}.wav')
        write_audio(path, wave[None, :], probe.SR)
        entries.append(dict(audio_path=path, ref=' '.join(words),
                            begin=0.0, end=len(wave) / probe.SR))
    val_json = str(tmp / 'val_shift.json')
    json.dump(entries, open(val_json, 'w'), ensure_ascii=False)
    return val_json


def run_eval(args, val_json, adapt, tag):
    cmd = [sys.executable, '-m', 'convasr_tpu.cli.train',
           '--checkpoint', args.checkpoint,
           '--val-data-path', val_json,
           '--experiments-dir', str(pathlib.Path(args.tmp) / 'exp'),
           '--experiment-id', f'adaptbn_{tag}',
           '--model', 'JasperNetSmall', '--num-input-features', '16',
           '--base-width', '8', '--val-batch-size', '20',
           '--bf16', 'false', '--dither', '0', '--num-workers', '0',
           '--batch-time-padding-multiple', '128',
           '--text-config', str(ROOT / 'configs' / 'ru_text_config.json'),
           '--val-config', str(ROOT / 'configs' / 'ru_val_config.json')]
    if args.synth == 'formant':
        # formant phones are 0.1 s = 10 frames, the default blank->space
        # threshold: peaky-CTC blank runs INSIDE a word trip it and split
        # words ('аб' -> 'а б'). The model emits space tokens itself (refs
        # contain spaces), so widen the heuristic out of the way.
        cmd += ['--replace-blank-series', '20']
    if args.device:
        cmd += ['--device', args.device]
    if adapt:
        cmd += ['--adapt-bn']
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=str(ROOT))
    text = out.stdout + out.stderr
    m = re.findall(r'WER: ([\d.]+)% CER: ([\d.]+)%', text)
    assert m, f'no WER line in eval output:\n{text[-3000:]}'
    wer, cer = float(m[-1][0]), float(m[-1][1])
    print(f'adapt_bn={adapt}: WER {wer:.2f}% CER {cer:.2f}%')
    return wer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--checkpoint', required=True)
    ap.add_argument('--val-noise', type=float, default=0.8,
                    help='shifted-domain noise floor (training used 0.4)')
    ap.add_argument('--synth', default='tone', choices=['tone', 'formant'],
                    help='formant: source-filter phones (VERDICT r3 #8); '
                         'pair with a checkpoint from lm_wer_probe --synth '
                         'formant, and shift via --val-noise ~0.5 + '
                         '--val-reverb')
    ap.add_argument('--val-reverb', type=float, default=0.0,
                    help='room RT60 (s) applied to the shifted val set '
                         '(formant mode: a channel shift beyond the noise '
                         'floor — reverb smears formant trajectories)')
    ap.add_argument('--speakers', type=int, default=4,
                    help='formant mode: speaker-pool size (must match the '
                         'training probe run)')
    ap.add_argument('--device', default=None)
    ap.add_argument('--tmp', default='/tmp/adapt_bn_probe')
    args = ap.parse_args()
    tmp = pathlib.Path(args.tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    probe.SYNTH_MODE = args.synth
    if args.synth == 'formant':
        # same fixed speaker pool as lm_wer_probe --synth formant (seed
        # 1234), so the SHIFT under test is noise+reverb, not speakers
        from convasr_tpu.audio.synth import speaker_profile
        spk_rng = np.random.RandomState(1234)
        probe._SPEAKERS.extend(speaker_profile(spk_rng)
                               for _ in range(args.speakers))
    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    # derive the val builder's edge context from the TRAINING corpus recipe
    # (lm_wer_probe writes corpus_meta.json next to train.json); refusing to
    # guess closes the silent --edge-pad mismatch foot-gun (VERDICT r4 #7)
    ck = pathlib.Path(args.checkpoint)
    meta_path = ck.parents[2] / 'corpus_meta.json'
    if meta_path.exists():
        meta = json.load(open(meta_path))
        edge_pad = meta['edge_pad']
        assert meta['synth'] == args.synth, \
            (f'--synth {args.synth} but the checkpoint trained on '
             f'{meta["synth"]} (from {meta_path})')
        print(f'training recipe ({meta_path}): edge_pad={edge_pad} '
              f'noise={meta["noise"]} synth={meta["synth"]}')
    else:
        edge_pad = 0.3
        print(f'WARNING: no corpus_meta.json at {meta_path} — assuming the '
              f'documented edge_pad=0.3; if the checkpoint trained without '
              f'--edge-pad 0.3 the adapt-bn comparison is INVALID '
              f'(edge-context mismatch masquerades as domain shift)')
    val_json = build_val(tmp, args.val_noise, reverb_rt60=args.val_reverb,
                         edge_pad=edge_pad)
    wer_off = run_eval(args, val_json, adapt=False, tag='off')
    wer_on = run_eval(args, val_json, adapt=True, tag='on')
    print(f'shifted-noise val (noise={args.val_noise}): '
          f'frozen-BN WER {wer_off:.2f}% -> adapted-BN WER {wer_on:.2f}% '
          f'({"improves" if wer_on < wer_off else "no gain"})')


if __name__ == '__main__':
    main()
