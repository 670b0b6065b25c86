"""Peaky-CTC train-time remedy evidence (VERDICT r4 next #7).

Round 4 documented a decode-time crutch: on the formant corpus, converged
CTC posteriors are blank-dominated ("peaky"), and blank runs INSIDE a word
trip GreedyCTCGenerator's blank->space threshold (transcribe default
--replace-blank-series 8), splitting words ('аб' -> 'а б'). The r4 answer
was to widen the threshold to 20 per-eval — a silent foot-gun: default flags
cost ~2x WER.

This probe measures the TRAIN-TIME fix: `--ctc-blank-penalty P` adds
P * mean valid-frame blank probability to the loss (train/loop.py
make_train_step), holding characters through their acoustic span so
intra-word blank runs stay under the default threshold.

For penalty in {0, P}: train on the formant corpus (lm_wer_probe --synth
formant recipe: confusable-F2 phones, 3-word sentences, edge-pad 0.3), then
decode held-out utterances through the REAL GreedyCTCGenerator at
blank_amount_to_space in {8 (transcribe default), 20 (the crutch)} and report

  - WER at both thresholds (success: with penalty, default ~= crutch),
  - mean blank posterior mass over valid frames,
  - spurious word splits: interior blank runs >= 8 in excess of the
    true word-boundary count (n_words - 1).

Spec context: /root/reference/transcript_generators.py:8-93 treats
blank_amount_to_space as a presentation knob, not a correctness crutch.

Usage: python scripts/blank_penalty_probe.py [--penalty 0.3]
       [--iterations 600] [--noise 0.2] [--tmp DIR]
"""
import argparse
import importlib.util
import json
import pathlib
import sys
import tempfile

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

spec = importlib.util.spec_from_file_location(
    'lm_wer_probe', ROOT / 'scripts' / 'lm_wer_probe.py')
probe = importlib.util.module_from_spec(spec)
spec.loader.exec_module(probe)
SR = probe.SR


def blank_stats(ids, blank_id, n_words):
    """(n interior blank runs >= 8 beyond the true word gaps, max interior
    run length) from an argmax path."""
    nz = np.nonzero(ids != blank_id)[0]
    if len(nz) == 0:
        return 0, 0
    runs, run = [], 0
    for t in range(nz[0], nz[-1] + 1):
        if ids[t] == blank_id:
            run += 1
        else:
            if run:
                runs.append(run)
            run = 0
    long_runs = sum(1 for r in runs if r >= 8)
    return max(0, long_runs - max(0, n_words - 1)), max(runs or [0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--penalty', type=float, default=0.3)
    ap.add_argument('--iterations', type=int, default=600)
    ap.add_argument('--noise', type=float, default=0.2)
    ap.add_argument('--shift-noise', type=float, default=0.3)
    ap.add_argument('--speakers', type=int, default=4)
    ap.add_argument('--tmp', default=None)
    ap.add_argument('--skip-train', action='store_true')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    probe.SYNTH_MODE = 'formant'
    from convasr_tpu.audio.synth import speaker_profile
    spk_rng = np.random.RandomState(1234)
    probe._SPEAKERS.extend(speaker_profile(spk_rng)
                           for _ in range(args.speakers))

    tmp = pathlib.Path(args.tmp or tempfile.mkdtemp(prefix='blankpen_'))
    tmp.mkdir(parents=True, exist_ok=True)
    print('tmp:', tmp, flush=True)
    train_json, val_json, entries = probe.build_corpus(
        tmp, args.noise, edge_pad=0.3)
    # SHIFTED val: the r4 pathology (intra-word blank runs splitting words)
    # appeared under domain shift (adapt_bn_probe: val noise 0.3 + RT60
    # 0.12), where posteriors go blank-heavy between weakened phones
    rng = np.random.RandomState(77)
    shift_entries = []
    from convasr_tpu.audio import write_audio
    from convasr_tpu.audio.synth import add_reverb
    for i in range(40):
        words = probe.sample_sentence(rng)
        wave = probe.synth_sentence(rng, words, args.shift_noise, edge_pad=0.3)
        wave = add_reverb(wave, SR, 0.12, rng)
        path = str(tmp / f'shift_{i}.wav')
        write_audio(path, wave[None, :], SR)
        shift_entries.append(dict(audio_path=path, ref=' '.join(words),
                                  begin=0.0, end=len(wave) / SR))
    entries['shift'] = shift_entries

    from convasr_tpu.cli import train as train_cli
    from convasr_tpu.cli.transcribe import build_parser as tp, setup
    from convasr_tpu.decode.generators import GreedyCTCGenerator
    from convasr_tpu.metrics import wer as wer_fn

    results = {}
    for penalty in [0.0, args.penalty]:
        tag = f'pen{penalty:g}'
        exp = tmp / 'exp'
        if not (args.skip_train
                and list((exp / tag).glob('checkpoint_epoch*_iter*'))):
            targs = train_cli.build_parser().parse_args([
                '--model', 'JasperNetSmall', '--num-input-features', '16',
                '--base-width', '8',
                '--train-data-path', train_json, '--val-data-path', val_json,
                '--experiments-dir', str(exp), '--experiment-id', tag,
                '--train-batch-size', '10',
                '--iterations', str(args.iterations),
                '--log-iteration-interval', '200',
                '--val-iteration-interval', str(args.iterations),
                '--epochs', '100000', '--bf16', 'false',
                '--skip-on-epoch-end-evaluation',
                '--optimizer', 'NovoGrad', '--lr', '2e-2', '--dropout', '0',
                '--num-workers', '0', '--batch-time-padding-multiple', '128',
                '--dither', '0', '--ctc-blank-penalty', str(penalty),
                '--text-config', str(ROOT / 'configs' / 'ru_text_config.json'),
                '--val-config', str(ROOT / 'configs' / 'ru_val_config.json')])
            train_cli.main(targs)
        ckpt = sorted((exp / tag).glob('checkpoint_epoch*_iter*'))[-1]

        sargs = tp().parse_args([
            '--checkpoint', str(ckpt), '-i', val_json, '-o', str(tmp / 'o'),
            '--output-json', '--bf16', 'false',
            '--text-config', str(ROOT / 'configs' / 'ru_text_config.json')])
        text_pipeline, frontend, model, forward, generator, _ = setup(sargs)
        tok = text_pipeline.tokenizer

        from convasr_tpu.audio import io as audio_io

        def eval_split(split_entries):
            sigs = [audio_io.read_audio(e['audio_path'], sample_rate=SR,
                                        mono=True)[0][0]
                    for e in split_entries]
            refs = [e['ref'] for e in split_entries]
            Tpad = int(np.ceil(max(len(s) for s in sigs) / 128) * 128)
            x = np.zeros((len(sigs), Tpad), np.float32)
            frac = np.array([len(s) / Tpad for s in sigs], np.float32)
            for j, s in enumerate(sigs):
                x[j, :len(s)] = s
            lp, logits, olen = forward(jnp.asarray(x), jnp.asarray(frac))
            lp, olen = np.asarray(lp), np.asarray(olen)

            blank_mass, splits, max_runs = [], [], []
            for b in range(len(sigs)):
                ids = np.argmax(lp[b, :olen[b]], -1)
                blank_mass.append(float(np.mean(
                    np.exp(lp[b, :olen[b], tok.eps_id]))))
                s, m = blank_stats(ids, tok.eps_id, len(refs[b].split()))
                splits.append(s)
                max_runs.append(m)

            row = dict(blank_mass=float(np.mean(blank_mass)),
                       spurious_splits=float(np.mean(splits)),
                       max_interior_run=float(np.mean(max_runs)))
            for bas in [8, 20]:
                gen = GreedyCTCGenerator(blank_amount_to_space=bas)
                hyps = []
                for b in range(len(sigs)):
                    tr = gen.generate(tok, lp[b:b + 1], [0.0],
                                      [len(sigs[b]) / SR],
                                      output_lengths=[int(olen[b])])[0][0]
                    hyps.append(text_pipeline.postprocess(
                        ' '.join(seg['hyp'] for seg in tr)))
                row[f'wer_bas{bas}'] = float(np.mean(
                    [wer_fn(hyp=h, ref=r) for h, r in zip(hyps, refs)]))
            return row

        results[tag] = {}
        for split in ['val', 'shift']:
            row = results[tag][split] = eval_split(entries[split])
            print(f'{tag}/{split}: default-flags WER {row["wer_bas8"]:.4f} '
                  f'| crutch (bas=20) WER {row["wer_bas20"]:.4f} | blank '
                  f'mass {row["blank_mass"]:.3f} | spurious splits/utt '
                  f'{row["spurious_splits"]:.2f} | mean max interior run '
                  f'{row["max_interior_run"]:.1f}', flush=True)

    print(json.dumps(results))
    for split in ['val', 'shift']:
        base = results['pen0'][split]
        pen = results[f'pen{args.penalty:g}'][split]
        print(f'{split}: penalty=0 crutch gain '
              f'{base["wer_bas8"] - base["wer_bas20"]:+.4f} (the pathology) '
              f'| penalty={args.penalty:g} default-vs-crutch '
              f'{pen["wer_bas8"] - pen["wer_bas20"]:+.4f}, default-flags WER '
              f'{base["wer_bas8"]:.4f} -> {pen["wer_bas8"]:.4f}')


if __name__ == '__main__':
    main()
