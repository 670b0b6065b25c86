"""Probe: measure held-out WER on the formant-synthesis corpus.

Mirrors tests/test_wer_harness.py::TestFormantWERHarness (same corpus
recipe: 6 words x 9 renditions, 4 speakers, noise sweep {0.005,0.02,0.05},
reverb rt60 0.12 on every 4th rendition, renditions 7-8 held out) but PRINTS
the landing WER for the per-round regression table in COMPONENTS.md instead
of asserting a bound. Spec: the reference validates on real corpora
(/root/reference/train.py val loop); no corpora ship in this image, so the
formant source-filter corpus (audio/synth.py) is the in-image stand-in.

Usage: python scripts/formant_wer_probe.py [--iterations 360] [--tmp DIR]
"""
import argparse
import json
import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax

ROOT = pathlib.Path(__file__).resolve().parent.parent
SR = 8000


def build_corpus(tmp):
    from convasr_tpu.audio import write_audio
    from convasr_tpu.audio.synth import speaker_profile, synth_sentence
    rng = np.random.RandomState(0)
    words = ['аб', 'вг', 'га', 'бв', 'аг', 'вб']
    speakers = [speaker_profile(rng) for _ in range(4)]
    train_entries, val_entries = [], []
    for w, word in enumerate(words):
        for r in range(9):
            spk = speakers[(w + r) % len(speakers)]
            noise = [0.005, 0.02, 0.05][r % 3]
            rt60 = 0.12 if r % 4 == 3 else 0.0
            wave = synth_sentence(rng, [word], SR, speaker=spk, noise=noise,
                                  reverb_rt60=rt60)
            path = str(tmp / f'{word}_{r}.wav')
            write_audio(path, wave[None, :], SR)
            entry = dict(audio_path=path, ref=word, begin=0.0,
                         end=len(wave) / SR)
            (val_entries if r >= 7 else train_entries).append(entry)
    train_json, val_json = str(tmp / 'train.json'), str(tmp / 'val.json')
    json.dump(train_entries, open(train_json, 'w'), ensure_ascii=False)
    json.dump(val_entries, open(val_json, 'w'), ensure_ascii=False)
    return train_json, val_json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iterations', type=int, default=360)
    ap.add_argument('--tmp', default=None)
    args = ap.parse_args()

    jax.config.update('jax_platforms', 'cpu')
    tmp = pathlib.Path(args.tmp or tempfile.mkdtemp(prefix='formantwer_'))
    tmp.mkdir(parents=True, exist_ok=True)
    print('tmp:', tmp)
    train_json, val_json = build_corpus(tmp)

    from convasr_tpu.cli import train as train_cli
    from convasr_tpu.cli import transcribe as transcribe_cli
    from convasr_tpu.metrics import wer as compute_wer
    exp = tmp / 'exp'
    targs = train_cli.build_parser().parse_args([
        '--model', 'JasperNetSmall', '--num-input-features', '16',
        '--base-width', '8',
        '--train-data-path', train_json, '--val-data-path', val_json,
        '--experiments-dir', str(exp), '--experiment-id', 'wer',
        '--train-batch-size', '8', '--iterations', str(args.iterations),
        '--log-iteration-interval', '90',
        '--val-iteration-interval', str(args.iterations),
        '--epochs', '300', '--bf16', 'false',
        '--optimizer', 'NovoGrad', '--lr', '2e-2', '--dropout', '0',
        '--num-workers', '0', '--batch-time-padding-multiple', '128',
        '--dither', '0',
        '--text-config', str(ROOT / 'configs' / 'ru_text_config.json'),
        '--val-config', str(ROOT / 'configs' / 'ru_val_config.json')])
    train_cli.main(targs)
    ckpts = sorted((exp / 'wer').glob('checkpoint_epoch*_iter*'))
    assert ckpts

    out_dir = tmp / 'transcribed'
    sargs = transcribe_cli.build_parser().parse_args([
        '--checkpoint', str(ckpts[-1]), '-i', val_json, '-o', str(out_dir),
        '--output-json', '--bf16', 'false', '--num-workers', '0',
        '--text-config', str(ROOT / 'configs' / 'ru_text_config.json')])
    transcribe_cli.main(sargs)
    hyps, refs = [], []
    for f in out_dir.glob('*.json'):
        for seg in json.load(open(f)):
            hyps.append(seg.get('hyp', ''))
            refs.append(seg.get('ref', ''))
    pairs = [(h, r) for h, r in zip(hyps, refs) if r]
    wer_val = float(np.mean([compute_wer(hyp=h, ref=r) for h, r in pairs]))
    print(f'formant corpus held-out WER: {wer_val:.4f} over {len(pairs)} utts')
    for h, r in pairs:
        print(f'  ref={r!r} hyp={h!r}')


if __name__ == '__main__':
    main()
