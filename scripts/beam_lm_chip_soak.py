"""Integrated on-chip decode soak: greedy vs C++ beam + in-repo binary word LM.

The components are each proven separately (tests/test_lm_wer.py on CPU:
greedy 0.192 -> host beam+wordLM 0.067); this drives the REAL transcribe CLI
on the REAL chip end-to-end over a shifted-noise val corpus — forward on the
TPU, decode greedy vs `--decoder BeamSearchDecoder --lm word.binlm` — and
reports both WERs, i.e. the full production recipe (train-corpus ARPA via
text/ngram_lm.py -> CNLM binary via text/binlm.py -> C++ beam) in one run.

Usage:
  python scripts/lm_wer_probe.py --tmp /tmp/lmwer_r3    # once, for the ckpt
  python scripts/beam_lm_chip_soak.py \
      --checkpoint /tmp/lmwer_r3/exp/lmwer/<ckpt> [--val-noise 0.7]
      [--device cpu]

Measured (2026-08-18, 600-iter tone-word checkpoint, val noise 0.7, REAL
chip): greedy WER 9.07% -> beam+binary-word-LM 5.83% (alpha 0.6, beta 0.5).
"""
import argparse
import importlib.util
import json
import pathlib
import subprocess
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

spec = importlib.util.spec_from_file_location(
    'lm_wer_probe', ROOT / 'scripts' / 'lm_wer_probe.py')
probe = importlib.util.module_from_spec(spec)
spec.loader.exec_module(probe)


def build_val(tmp, noise, n=60, seed=11):
    from convasr_tpu.audio import write_audio
    rng = np.random.RandomState(seed)
    entries = []
    for i in range(n):
        words = probe.sample_sentence(rng)
        wave = probe.synth_sentence(rng, words, noise, edge_pad=0.3)
        path = str(tmp / f'soak_{i}.wav')
        write_audio(path, wave[None, :], probe.SR)
        entries.append(dict(audio_path=path, ref=' '.join(words),
                            begin=0.0, end=len(wave) / probe.SR))
    val_json = str(tmp / 'val_soak.json')
    json.dump(entries, open(val_json, 'w'), ensure_ascii=False)
    return val_json


def build_binlm(tmp, train_json):
    """Word-bigram ARPA from the TRAINING transcripts -> CNLM binary."""
    from convasr_tpu.text.binlm import build_binary_lm
    from convasr_tpu.text.ngram_lm import save_arpa, train_ngram_lm
    texts = [e['ref'] for e in json.load(open(train_json))]
    arpa = save_arpa(train_ngram_lm([t.split() for t in texts], order=2),
                     str(tmp / 'soak_word.arpa'))
    return build_binary_lm(arpa, str(tmp / 'soak_word.binlm'))


def run_transcribe(args, val_json, out, extra):
    cmd = [sys.executable, '-m', 'convasr_tpu.cli.transcribe',
           '--checkpoint', args.checkpoint, '-i', val_json, '-o', out,
           '--output-json', '--bf16', 'false',
           '--text-config', str(ROOT / 'configs' / 'ru_text_config.json')] + extra
    if args.device:
        cmd += ['--device', args.device]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=str(ROOT))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]


def score(val_json, out):
    from convasr_tpu.metrics import wer as wer_fn
    entries = json.load(open(val_json))
    wers = []
    for e in entries:
        name = pathlib.Path(e['audio_path']).name + '.json'
        segs = json.load(open(pathlib.Path(out) / name))
        segs = segs if isinstance(segs, list) else [segs]
        hyp = ' '.join(s['hyp'] for s in segs if s.get('hyp'))
        wers.append(wer_fn(hyp=hyp, ref=e['ref']))
    return float(np.mean(wers))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--checkpoint', required=True)
    ap.add_argument('--val-noise', type=float, default=0.7)
    ap.add_argument('--beam-alpha', type=float, default=0.6)
    ap.add_argument('--beam-beta', type=float, default=0.5)
    ap.add_argument('--device', default=None)
    ap.add_argument('--tmp', default='/tmp/beam_lm_soak')
    ap.add_argument('--train-json', default='/tmp/lmwer_r3/train.json')
    args = ap.parse_args()
    tmp = pathlib.Path(args.tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    val_json = build_val(tmp, args.val_noise)
    binlm = build_binlm(tmp, args.train_json)

    run_transcribe(args, val_json, str(tmp / 'out_greedy'), [])
    greedy = score(val_json, str(tmp / 'out_greedy'))
    print(f'greedy (on-chip forward): WER {greedy * 100:.2f}%')

    run_transcribe(args, val_json, str(tmp / 'out_beam'),
                   ['--decoder', 'BeamSearchDecoder', '--lm', binlm,
                    '--beam-alpha', str(args.beam_alpha),
                    '--beam-beta', str(args.beam_beta),
                    '--beam-width', '32', '--beam-cutoff-top-n', '6'])
    beam = score(val_json, str(tmp / 'out_beam'))
    print(f'beam+binary-word-LM (a={args.beam_alpha} b={args.beam_beta}): '
          f'WER {beam * 100:.2f}%')
    print('improves' if beam < greedy else 'NO GAIN')


if __name__ == '__main__':
    main()
