"""Full WER ladder on the SCALED formant corpus (VERDICT r4 next #1 + #2).

Builds the audio/corpus.py corpus (25 phones / 120 words / 20 speakers,
disjoint train-dev-test speakers, noise levels, and reverb), trains with the
real train CLI, then measures every decoder rung on the held-out TEST split
(unseen speakers AND unseen noise AND unseen reverb):

  greedy | host beam | beam + word-LM fusion | beam + LM rescore |
  hybrid device beam (K=16/32/64) with ORACLE WER per K

The oracle column answers VERDICT r4 weak #2 (hybrid WER degrading with K):
oracle = min WER over the K device-beam hypotheses. If oracle improves with K
while 1-best worsens, ranking (rescore rule) is at fault; if oracle itself
degrades, the device beam's merge/prune drops the truth.

Spec: the reference validates on real corpora (/root/reference/train.py val
loop; datasets/README.md:100-133); this corpus is the in-image stand-in.

Usage:
  python scripts/formant_ladder_probe.py --device cpu --speakers 8 \
      --utts 8 --iterations 800           # quick CPU calibration
  python scripts/formant_ladder_probe.py --device axon --iterations 4000
      # full-scale ladder on the chip (numbers for COMPONENTS.md)
"""
import argparse
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax

ROOT = pathlib.Path(__file__).resolve().parent.parent
SR = 8000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--device', default='cpu', choices=['cpu', 'axon', 'tpu'])
    ap.add_argument('--speakers', type=int, default=20)
    ap.add_argument('--utts', type=int, default=30, help='train utts/speaker')
    ap.add_argument('--n-words', type=int, default=120)
    ap.add_argument('--iterations', type=int, default=4000)
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--base-width', type=int, default=32)
    ap.add_argument('--features', type=int, default=32)
    ap.add_argument('--dropout', type=float, default=0.2)
    ap.add_argument('--lr', type=float, default=1e-2)
    ap.add_argument('--max-words', type=int, default=8)
    ap.add_argument('--tmp', default=None)
    ap.add_argument('--skip-train', action='store_true')
    ap.add_argument('--skip-build', action='store_true')
    ap.add_argument('--split', default='test', choices=['test', 'dev'])
    ap.add_argument('--alpha', type=float, default=None,
                    help='fix rescore alpha (else small grid)')
    ap.add_argument('--beta', type=float, default=None)
    ap.add_argument('--blank-penalty', type=float, default=0.0,
                    help='train-time peaky-CTC remedy (--ctc-blank-penalty)')
    ap.add_argument('--eval-noise', type=float, default=None,
                    help='render a STRESS eval split at this noise level '
                         '(same test speakers/lexicon; the matched test '
                         'split saturates near 0 WER once trained, so '
                         'decoder deltas need a stressed condition)')
    ap.add_argument('--eval-rt60', type=float, default=0.0)
    ap.add_argument('--eval-utts', type=int, default=12)
    ap.add_argument('--save-lp', default=None,
                    help='dump the eval posteriors (lp/olen/refs .npz) for '
                         'offline ranking studies (hybrid_rank_probe.py)')
    ap.add_argument('--forward-only', action='store_true',
                    help='stop after the forward + --save-lp dump')
    args = ap.parse_args()

    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    tmp = pathlib.Path(args.tmp or tempfile.mkdtemp(prefix='ladder_'))
    tmp.mkdir(parents=True, exist_ok=True)
    print('tmp:', tmp, flush=True)

    from convasr_tpu.audio.corpus import build_corpus
    t0 = time.time()
    if args.skip_build and (tmp / 'train.json').exists():
        paths = {s: str(tmp / f'{s}.json') for s in ('train', 'dev', 'test')}
        paths['lm_text'] = str(tmp / 'lm.txt')
        for s in ('train', 'dev', 'test'):
            paths[f'{s}_entries'] = json.load(open(paths[s]))
    else:
        paths = build_corpus(tmp, n_speakers=args.speakers,
                             utts_per_speaker=args.utts,
                             n_words=args.n_words, max_words=args.max_words)
    n_train = len(paths['train_entries'])
    train_sec = sum(e['end'] for e in paths['train_entries'])
    print(f'corpus: {n_train} train utts ({train_sec/60:.1f} min), '
          f'{len(paths["dev_entries" if "dev_entries" in paths else "dev"])} dev, '
          f'{len(paths["test_entries"])} test; built in {time.time()-t0:.0f}s',
          flush=True)

    # word 3-gram LM from TRAIN transcripts (in-repo lmplz replacement)
    from convasr_tpu.text.ngram_lm import save_arpa, train_ngram_lm
    train_texts = [e['ref'] for e in paths['train_entries']]
    word_arpa = save_arpa(train_ngram_lm([t.split() for t in train_texts],
                                         order=3), str(tmp / 'word.arpa'))
    print('word LM:', word_arpa, flush=True)

    from convasr_tpu.cli import train as train_cli
    exp = tmp / 'exp'
    if not args.skip_train:
        train_flags = [
            '--model', 'JasperNetSmall',
            '--num-input-features', str(args.features),
            '--base-width', str(args.base_width),
            '--train-data-path', paths['train'],
            '--val-data-path', paths['dev'],
            '--experiments-dir', str(exp), '--experiment-id', 'ladder',
            '--train-batch-size', str(args.batch_size),
            '--iterations', str(args.iterations),
            '--log-iteration-interval', '200',
            '--val-iteration-interval', str(args.iterations),
            '--epochs', '100000', '--bf16', 'false',
            '--skip-on-epoch-end-evaluation',  # tiny epochs on this corpus
            '--optimizer', 'NovoGrad', '--lr', str(args.lr),
            '--dropout', str(args.dropout),
            '--num-workers', '0', '--batch-time-padding-multiple', '128',
            '--ctc-blank-penalty', str(args.blank_penalty),
            '--text-config', str(ROOT / 'configs' / 'ru_text_config.json'),
            '--val-config', str(ROOT / 'configs' / 'ru_val_config.json')]
        if args.device != 'cpu':
            train_flags += ['--device', 'axon', '--device-cache',
                            '--steps-per-dispatch', '16',
                            '--device-transport', 'int16']
        targs = train_cli.build_parser().parse_args(train_flags)
        train_cli.main(targs)
    ckpts = sorted((exp / 'ladder').glob('checkpoint_epoch*_iter*'))
    assert ckpts, 'no checkpoint'
    print('ckpt:', ckpts[-1], flush=True)

    # in-process forward over the held-out split
    from convasr_tpu.cli.transcribe import build_parser as tp, setup
    sargs = tp().parse_args([
        '--checkpoint', str(ckpts[-1]), '-i', paths[args.split],
        '-o', str(tmp / 'o'), '--output-json', '--bf16', 'false',
        '--text-config', str(ROOT / 'configs' / 'ru_text_config.json')]
        + (['--device', 'axon'] if args.device != 'cpu' else []))
    text_pipeline, frontend, model, forward, generator, _ = setup(sargs)
    tok = text_pipeline.tokenizer

    import jax.numpy as jnp
    from convasr_tpu.audio import io as audio_io
    split_name = args.split
    if args.eval_noise is not None:
        split_name = f'stress_n{args.eval_noise:g}_r{args.eval_rt60:g}'
        sp = tmp / f'{split_name}.json'
        if not sp.exists():
            from convasr_tpu.audio.corpus import build_eval_split
            build_eval_split(tmp, split_name, (args.eval_noise,),
                             (args.eval_rt60,), n_speakers=args.speakers,
                             utts_per_speaker=args.eval_utts,
                             n_words=args.n_words, max_words=args.max_words)
        paths[split_name] = str(sp)
        paths[f'{split_name}_entries'] = json.load(open(sp))
    entries = paths[f'{split_name}_entries']
    # ONE padded shape + batched forward: per-utt B=1 shapes would each pay a
    # fresh compile through the axon tunnel (30 s+ per shape)
    sigs = []
    for e in entries:
        sig, _ = audio_io.read_audio(e['audio_path'], sample_rate=SR, mono=True)
        sigs.append(sig[0])
    refs = [e['ref'] for e in entries]
    Tpad = int(np.ceil(max(len(s) for s in sigs) / 128) * 128)
    lps, olens = [], []
    t0 = time.time()
    EB = 8
    for i in range(0, len(sigs), EB):
        chunk = sigs[i:i + EB]
        x = np.zeros((len(chunk), Tpad), np.float32)
        frac = np.zeros(len(chunk), np.float32)
        for j, s in enumerate(chunk):
            x[j, :len(s)] = s
            frac[j] = len(s) / Tpad
        # pad the last chunk's batch dim so every dispatch is the same shape
        if len(chunk) < EB:
            x = np.concatenate([x, np.zeros((EB - len(chunk), Tpad), np.float32)])
            frac = np.concatenate([frac, np.full(EB - len(chunk), 1e-6, np.float32)])
        lp, logits, olen = forward(jnp.asarray(x), jnp.asarray(frac))
        lp, olen = np.asarray(lp), np.asarray(olen)
        for j in range(len(chunk)):
            lps.append(lp[j])
            olens.append(int(olen[j]))
    print(f'forward over {len(entries)} {split_name} utts: '
          f'{time.time()-t0:.0f}s', flush=True)

    if args.save_lp:
        Tm = max(lp.shape[0] for lp in lps)
        lp_d = np.full((len(lps), Tm, lps[0].shape[-1]), -20.0, np.float32)
        for i, lp in enumerate(lps):
            lp_d[i, :lp.shape[0]] = lp
        np.savez(args.save_lp, lp=lp_d, olen=np.asarray(olens, np.int32),
                 refs=np.asarray(refs, object), word_arpa=word_arpa,
                 split=split_name)
        print('saved posteriors to', args.save_lp, flush=True)
        if args.forward_only:
            return

    from convasr_tpu.metrics import wer as wer_fn

    def score(hyps):
        return float(np.mean([wer_fn(hyp=h, ref=r)
                              for h, r in zip(hyps, refs)]))

    def to_text(tokens):
        return text_pipeline.postprocess(text_pipeline.decode([tokens])[0])

    results = {}

    # 1. greedy
    ghyps = []
    for lp, ol in zip(lps, olens):
        ids = np.argmax(lp[:ol], -1)
        out, prev = [], -1
        for t in ids:
            if t != prev and t != tok.eps_id:
                out.append(int(t))
            prev = t
        ghyps.append(to_text(out))
    results['greedy'] = score(ghyps)
    print(f"greedy WER: {results['greedy']:.4f}", flush=True)
    for h, r in list(zip(ghyps, refs))[:3]:
        print(f'  ref={r!r}\n  hyp={h!r}')

    from convasr_tpu.decode.beam import (
        BeamSearchDecoder, decode_device_with_lm, load_lm, rescore_with_lm)

    # 2. host beam, acoustic only
    dec0 = BeamSearchDecoder(tok, beam_width=32, cutoff_top_n=8)
    results['beam'] = score([to_text(dec0.decode(lp[None, :ol])[0])
                             for lp, ol in zip(lps, olens)])
    print(f"host beam no-LM WER: {results['beam']:.4f}", flush=True)

    alphas = [args.alpha] if args.alpha is not None else [0.3, 0.6, 1.0]
    betas = [args.beta] if args.beta is not None else [0.0, 1.0]

    # 3. host beam + word-LM in-beam fusion
    best = None
    for a in alphas:
        for b in betas:
            dec = BeamSearchDecoder(tok, lm_path=word_arpa, beam_width=32,
                                    beam_alpha=a, beam_beta=b, cutoff_top_n=8)
            w = score([to_text(dec.decode(lp[None, :ol])[0])
                       for lp, ol in zip(lps, olens)])
            print(f'  beam+LM fusion a={a} b={b}: {w:.4f}', flush=True)
            if best is None or w < best[0]:
                best = (w, a, b)
    results['beam_lm_fusion'] = best[0]
    print(f"host beam+wordLM fusion WER: {best[0]:.4f} (a={best[1]} b={best[2]})")

    # 4. host beam acoustic-only + LM RESCORING of complete hypotheses
    best_r = None
    for a in alphas:
        for b in betas:
            dec = BeamSearchDecoder(tok, lm_path=word_arpa, beam_width=32,
                                    beam_alpha=a, beam_beta=b, cutoff_top_n=8,
                                    rescore=True, rescore_topk=16)
            w = score([to_text(dec.decode(lp[None, :ol])[0])
                       for lp, ol in zip(lps, olens)])
            print(f'  beam+rescore a={a} b={b}: {w:.4f}', flush=True)
            if best_r is None or w < best_r[0]:
                best_r = (w, a, b)
    results['beam_rescore'] = best_r[0]
    print(f"host beam+LM rescore WER: {best_r[0]:.4f} "
          f"(a={best_r[1]} b={best_r[2]})", flush=True)

    # 5. HYBRID device beam + host rescoring, K sweep + ORACLE (VERDICT #2)
    Tmax = max(lp.shape[0] for lp in lps)
    C = lps[0].shape[-1]
    lp_pad = np.full((len(lps), Tmax, C), -20.0, np.float32)
    for i, lp in enumerate(lps):
        lp_pad[i, :lp.shape[0]] = lp
    ol_arr = np.asarray(olens, np.int32)
    a_r, b_r = best_r[1], best_r[2]
    wlm = load_lm(word_arpa)
    labels_l = [str(l).lower() for l in tok.vocab]

    from convasr_tpu.ops.beam_device import beam_search_device
    for K in [16, 32, 64]:
        tokens, lens, scores_d = beam_search_device(
            jnp.asarray(lp_pad), jnp.asarray(ol_arr), tok.eps_id,
            beam_width=K, cutoff_top_n=8, max_len=Tmax + 1,
            compact_tokens=True)
        tokens, lens, scores_d = map(np.asarray, (tokens, lens, scores_d))
        one_best, oracle, truth_in_topk = [], [], 0
        for bidx in range(len(lps)):
            hyps = [(tokens[bidx, k, :lens[bidx, k]].tolist(),
                     float(scores_d[bidx, k])) for k in range(K)]
            texts = [to_text(h[0]) for h in hyps]
            wers = [wer_fn(hyp=t, ref=refs[bidx]) for t in texts]
            oracle.append(min(wers))
            if refs[bidx] in texts:
                truth_in_topk += 1
            re = rescore_with_lm(hyps, labels_l, wlm, a_r, b_r)
            one_best.append(to_text(list(re[0][0])))
        w1, wo = score(one_best), float(np.mean(oracle))
        results[f'hybrid_K{K}'] = w1
        results[f'oracle_K{K}'] = wo
        print(f'hybrid K={K}: 1-best WER {w1:.4f} | oracle WER {wo:.4f} | '
              f'exact truth in top-K {truth_in_topk}/{len(lps)}', flush=True)

    print('\n=== ladder (split=%s, a=%s b=%s) ===' % (split_name, a_r, b_r))
    for k, v in results.items():
        print(f'{k:18s} {v:.4f}')
    print(json.dumps(dict(results, split=split_name, n=len(lps),
                          alpha=a_r, beta=b_r)))


if __name__ == '__main__':
    main()
