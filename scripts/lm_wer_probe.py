"""Probe: tune the hard synthetic corpus where beam+LM must beat greedy WER.

Design (VERDICT r2 #2): chars are tones 50 Hz apart — exactly the DFT bin
width of the 0.02 s frontend window — buried in noise, so even a converged
model confuses adjacent chars; sentences follow a sparse word-bigram grammar
so a word LM (trained in-repo, text/ngram_lm.py) carries real evidence.

Prints greedy WER and beam+LM WERs over an (alpha, beta) grid for the C++
host beam and the on-device beam with char-bigram fusion.

Usage: python scripts/lm_wer_probe.py [--noise 0.35] [--iterations 600]
       python scripts/lm_wer_probe.py --synth formant --noise 0.2
         (formant-synthesis phones with grammar-matched confusable F2 pairs
          instead of sine tones — VERDICT r3 #8)
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
import os
CHARS = 'абвг'
# 150 Hz spacing puts each char tone in a distinct mel bin (16 feats/4 kHz) so
# the model can learn the chars; --noise then drives the confusion rate.
# Measured (600 iters, noise 0.4): greedy WER 0.192, host beam+wordLM 0.067
# (a=0.6-1.0), beam no-LM 0.192, device beam+charLM 0.142 (a=0.4 b=2.0).
SPACING = int(os.environ.get('TONE_SPACING', '150'))
TONES = {c: 500 + SPACING * i for i, c in enumerate(CHARS)}

# --synth formant (VERDICT r3 #8): source-filter phones (audio/synth.py)
# instead of sine tones. Confusability is engineered to match the GRAMMAR's
# minimal pairs: б/в share F1 and sit 200 Hz apart in F2 (аб vs ав, бг vs
# вг differ only in that char), as do а/г (ба vs бг after the transposition
# pair вг/гв). With per-speaker ±6% formant shift + per-utterance jitter
# the F2 distributions overlap, so the acoustic model confuses exactly the
# chars the word LM can disambiguate.
CONFUSABLE_FORMANTS = {
    'а': [(700, 110), (1150, 170)],
    'г': [(700, 110), (1350, 170)],
    'б': [(380, 85), (2100, 250)],
    'в': [(380, 85), (2320, 250)],
}

WORDS = ['аб', 'ав', 'ба', 'вг', 'гв', 'бг']
# sparse word-bigram grammar: each word has few legal successors, and the
# legal successor differs between confusable pairs (аб vs ав etc.)
GRAMMAR = {
    None: ['аб', 'ав', 'ба'],
    'аб': ['вг', 'ба'],
    'ав': ['гв'],
    'ба': ['аб', 'бг'],
    'вг': ['ба'],
    'гв': ['бг'],
    'бг': ['аб'],
}


SYNTH_MODE = 'tone'  # set by --synth; 'formant' renders source-filter phones
_SPEAKERS: list = []  # formant mode: fixed speaker pool, sampled per utt


def synth_word(rng, word, noise, char_sec=0.1, gap_sec=0.05):
    if SYNTH_MODE == 'formant':
        from convasr_tpu.audio.synth import synth_word as formant_synth_word
        spk = _SPEAKERS[rng.randint(len(_SPEAKERS))] if _SPEAKERS else None
        return formant_synth_word(rng, word, SR, speaker=spk,
                                  char_sec=char_sec, gap_sec=gap_sec,
                                  noise=noise,
                                  formant_table=CONFUSABLE_FORMANTS)
    chunks = [noise * rng.randn(int(SR * gap_sec))]
    for ch in word:
        t = np.arange(int(SR * char_sec)) / SR
        phase = rng.uniform(0, 2 * np.pi)
        chunks.append(0.5 * np.sin(2 * np.pi * TONES[ch] * t + phase)
                      + noise * rng.randn(len(t)))
        chunks.append(noise * rng.randn(int(SR * gap_sec)))
    return np.concatenate(chunks)


def synth_sentence(rng, words, noise, edge_pad=0.0):
    """edge_pad > 0 adds random-length low-noise-floor context on both ends
    (0..edge_pad s at amplitude 0.02) so the model learns VAD-style sloppy
    segment boundaries instead of overfitting exact utterance framing."""
    waves = [synth_word(rng, w, noise) for w in words]
    if edge_pad > 0:
        waves = [(0.02 * rng.randn(int(SR * rng.uniform(0, edge_pad))))] \
            + waves + [(0.02 * rng.randn(int(SR * rng.uniform(0, edge_pad))))]
    return np.concatenate(waves).astype(np.float32)


def sample_sentence(rng, length=3):
    words = []
    prev = None
    for _ in range(length):
        cand = GRAMMAR[prev]
        words.append(cand[rng.randint(len(cand))])
        prev = words[-1]
    return words


def build_corpus(tmp, noise, n_train=100, n_val=40, seed=0, edge_pad=0.0):
    from convasr_tpu.audio import write_audio
    rng = np.random.RandomState(seed)
    entries = {'train': [], 'val': []}
    for split, n in [('train', n_train), ('val', n_val)]:
        for i in range(n):
            words = sample_sentence(rng)
            wave = synth_sentence(rng, words, noise, edge_pad=edge_pad)
            path = str(tmp / f'{split}_{i}.wav')
            write_audio(path, wave[None, :], SR)
            entries[split].append(dict(audio_path=path, ref=' '.join(words),
                                       begin=0.0, end=len(wave) / SR))
    train_json, val_json = str(tmp / 'train.json'), str(tmp / 'val.json')
    json.dump(entries['train'], open(train_json, 'w'), ensure_ascii=False)
    json.dump(entries['val'], open(val_json, 'w'), ensure_ascii=False)
    # corpus recipe sidecar: downstream probes (adapt_bn_probe) MUST build
    # their shifted val sets with the SAME edge context the model trained
    # on, or the edge mismatch masquerades as domain shift (VERDICT r4 #7)
    json.dump(dict(synth=SYNTH_MODE, noise=noise, edge_pad=edge_pad,
                   seed=seed, speakers=len(_SPEAKERS)),
              open(tmp / 'corpus_meta.json', 'w'))
    return train_json, val_json, entries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--noise', type=float, default=0.4)
    ap.add_argument('--iterations', type=int, default=600)
    ap.add_argument('--edge-pad', type=float, default=0.0,
                    help='random 0..N s noise-floor context on both '
                         'utterance ends (robustness to VAD segment '
                         'boundaries; used by long_audio_e2e training)')
    ap.add_argument('--tmp', default=None)
    ap.add_argument('--skip-train', action='store_true',
                    help='reuse the checkpoint already in --tmp')
    ap.add_argument('--synth', default='tone', choices=['tone', 'formant'],
                    help='formant: source-filter phones with grammar-matched '
                         'confusable F2 pairs (VERDICT r3 #8); noise is the '
                         'additive floor against ~0.35-peak phones — use '
                         '~0.15-0.25')
    ap.add_argument('--speakers', type=int, default=4,
                    help='formant mode: speaker-pool size')
    args = ap.parse_args()

    global SYNTH_MODE
    SYNTH_MODE = args.synth
    if args.synth == 'formant':
        from convasr_tpu.audio.synth import speaker_profile
        spk_rng = np.random.RandomState(1234)
        _SPEAKERS.extend(speaker_profile(spk_rng)
                         for _ in range(args.speakers))

    jax.config.update('jax_platforms', 'cpu')
    tmp = pathlib.Path(args.tmp or tempfile.mkdtemp(prefix='lmwer_'))
    tmp.mkdir(parents=True, exist_ok=True)
    print('tmp:', tmp)
    train_json, val_json, entries = build_corpus(tmp, args.noise,
                                             edge_pad=args.edge_pad)

    from convasr_tpu.cli import train as train_cli
    exp = tmp / 'exp'
    if not args.skip_train:
        targs = train_cli.build_parser().parse_args([
            '--model', 'JasperNetSmall', '--num-input-features', '16',
            '--base-width', '8',
            '--train-data-path', train_json, '--val-data-path', val_json,
            '--experiments-dir', str(exp), '--experiment-id', 'lmwer',
            '--train-batch-size', '10', '--iterations', str(args.iterations),
            '--log-iteration-interval', '100',
            '--val-iteration-interval', str(args.iterations),
            '--epochs', '1000', '--bf16', 'false',
            '--optimizer', 'NovoGrad', '--lr', '2e-2', '--dropout', '0',
            '--num-workers', '0', '--batch-time-padding-multiple', '128',
            '--dither', '0',
            '--text-config', str(ROOT / 'configs' / 'ru_text_config.json'),
            '--val-config', str(ROOT / 'configs' / 'ru_val_config.json')])
        train_cli.main(targs)

    ckpts = sorted((exp / 'lmwer').glob('checkpoint_epoch*_iter*'))
    assert ckpts, 'no checkpoint'
    print('ckpt:', ckpts[-1])

    # in-process forward over val for log_probs
    from convasr_tpu.cli.transcribe import build_parser as tp, setup
    sargs = tp().parse_args([
        '--checkpoint', str(ckpts[-1]), '-i', val_json, '-o', str(tmp / 'o'),
        '--output-json', '--bf16', 'false',
        '--text-config', str(ROOT / 'configs' / 'ru_text_config.json')])
    text_pipeline, frontend, model, forward, generator, _ = setup(sargs)
    tok = text_pipeline.tokenizer

    import jax.numpy as jnp
    from convasr_tpu.audio import io as audio_io
    lps, olens, refs = [], [], []
    for e in entries['val']:
        sig, _ = audio_io.read_audio(e['audio_path'], sample_rate=SR, mono=True)
        T = int(np.ceil(sig.shape[-1] / 128) * 128)
        x = np.zeros((1, T), np.float32)
        x[0, :sig.shape[-1]] = sig[0]
        lp, logits, olen = forward(jnp.asarray(x),
                                   jnp.asarray([sig.shape[-1] / T], np.float32))
        lps.append(np.asarray(lp)[0])
        olens.append(int(np.asarray(olen)[0]))
        refs.append(e['ref'])

    from convasr_tpu.metrics import wer as wer_fn

    def score(hyps):
        return float(np.mean([wer_fn(hyp=h, ref=r) for h, r in zip(hyps, refs)]))

    def to_text(tokens):
        return text_pipeline.postprocess(text_pipeline.decode([tokens])[0])

    # greedy
    from convasr_tpu.decode.beam import BeamSearchDecoder, GreedyDecoder
    greedy_tok = [np.argmax(lp[:ol], -1) for lp, ol in zip(lps, olens)]
    from convasr_tpu.decode.generators import GreedyCTCGenerator
    ghyps = []
    for gt in greedy_tok:
        # collapse repeats + blanks like the generator
        out, prev = [], -1
        for t in gt:
            if t != prev and t != tok.eps_id:
                out.append(int(t))
            prev = t
        ghyps.append(to_text(out))
    gwer = score(ghyps)
    print(f'greedy WER: {gwer:.3f}')
    print('sample:', list(zip(ghyps[:4], refs[:4])))

    # in-repo LMs from TRAIN transcripts
    from convasr_tpu.text.ngram_lm import char_tokenize, save_arpa, train_ngram_lm
    train_texts = [e['ref'] for e in entries['train']]
    word_arpa = save_arpa(train_ngram_lm([t.split() for t in train_texts], order=2),
                          str(tmp / 'word.arpa'))
    char_arpa = save_arpa(train_ngram_lm([char_tokenize(t) for t in train_texts],
                                         order=2), str(tmp / 'char.arpa'))

    for alpha in [0.3, 0.6, 1.0, 1.5]:
        for beta in [0.0, 0.5, 1.0]:
            dec = BeamSearchDecoder(tok, lm_path=word_arpa, beam_width=32,
                                    beam_alpha=alpha, beam_beta=beta,
                                    cutoff_top_n=6)
            hyps = [to_text(dec.decode(lp[None, :ol])[0])
                    for lp, ol in zip(lps, olens)]
            print(f'host beam+wordLM a={alpha} b={beta}: WER {score(hyps):.3f}')

    # no-LM beam baseline
    dec0 = BeamSearchDecoder(tok, beam_width=32, cutoff_top_n=6)
    hyps0 = [to_text(dec0.decode(lp[None, :ol])[0]) for lp, ol in zip(lps, olens)]
    print(f'host beam no-LM: WER {score(hyps0):.3f}')

    # device beam + char-bigram fusion
    from convasr_tpu.decode.beam import ArpaLM, char_lm_table
    from convasr_tpu.ops.beam_device import beam_search_device
    table = char_lm_table(ArpaLM(char_arpa), tok.vocab)
    for alpha in [0.2, 0.4, 0.8, 1.2]:
        for beta in [0.0, 0.5, 1.0, 2.0]:
            hyps = []
            for lp, ol in zip(lps, olens):
                tks, lens, _ = beam_search_device(
                    jnp.asarray(lp[None]), jnp.asarray([ol], np.int32), tok.eps_id,
                    beam_width=8, cutoff_top_n=4, max_len=lp.shape[0] + 1,
                    lm_table=table, lm_alpha=alpha, lm_beta=beta)
                tks, lens = np.asarray(tks), np.asarray(lens)
                hyps.append(to_text(tks[0, 0, :lens[0, 0]].tolist()))
            print(f'device beam+charLM a={alpha} b={beta}: WER {score(hyps):.3f}')

    # HYBRID (VERDICT r3 #6): device beam top-K CTC hypotheses -> host word-
    # LM rescoring (K x num_words LM lookups per utterance instead of
    # per-frame fusion; decode/beam.py::decode_device_with_lm)
    from convasr_tpu.decode.beam import decode_device_with_lm
    Tmax = max(lp.shape[0] for lp in lps)
    lp_pad = np.full((len(lps), Tmax, lps[0].shape[-1]), -20.0, np.float32)
    for i, lp in enumerate(lps):
        lp_pad[i, :lp.shape[0]] = lp
    ol_arr = np.asarray(olens, np.int32)
    best_h = None
    for alpha in [0.3, 0.6, 1.0, 1.5]:
        for beta in [0.0, 0.5, 1.0]:
            toks = decode_device_with_lm(lp_pad, ol_arr, tok,
                                         lm_path=word_arpa, alpha=alpha,
                                         beta=beta, beam_width=16,
                                         cutoff_top_n=6)
            w = score([to_text(tk) for tk in toks])
            print(f'hybrid device-beam+host-wordLM rescoring a={alpha} '
                  f'b={beta}: WER {w:.3f}')
            if best_h is None or w < best_h[0]:
                best_h = (w, alpha, beta)

    # wider device beam at the best (alpha, beta) — K is cheap after the
    # r4 gather-free rewrite, does accuracy keep improving?
    for K in [32, 64]:
        toks = decode_device_with_lm(lp_pad, ol_arr, tok, lm_path=word_arpa,
                                     alpha=best_h[1], beta=best_h[2],
                                     beam_width=K, cutoff_top_n=6)
        print(f'hybrid K={K} a={best_h[1]} b={best_h[2]}: '
              f'WER {score([to_text(tk) for tk in toks]):.3f}')

    # HOST-ONLY hybrid: host beam (no in-beam LM) top-16 complete hypotheses
    # -> word-LM rescoring. If this matches the device hybrid's WER, the
    # recipe transfers to streaming finals with zero device changes.
    from convasr_tpu.decode.beam import load_lm, rescore_with_lm
    wlm = load_lm(word_arpa)
    labels_l = [str(l).lower() for l in tok.vocab]
    dec_k = BeamSearchDecoder(tok, beam_width=16, cutoff_top_n=6, topk=16)
    best_hh = None
    for alpha in [0.3, 0.6, 1.0, 1.5]:
        for beta in [0.0, 0.5, 1.0]:
            hyps = []
            for lp, ol in zip(lps, olens):
                k_hyps = dec_k.decode_one(lp[:ol])
                re = rescore_with_lm(k_hyps, labels_l, wlm, alpha, beta)
                hyps.append(to_text(list(re[0][0])))
            w = score(hyps)
            print(f'host-beam top-16 + wordLM rescoring a={alpha} b={beta}: '
                  f'WER {w:.3f}')
            if best_hh is None or w < best_hh[0]:
                best_hh = (w, alpha, beta)
    print(f'best host-only hybrid: WER {best_hh[0]:.3f} at a={best_hh[1]} '
          f'b={best_hh[2]} (device hybrid best {best_h[0]:.3f})')

    # decoder throughput on this corpus (same inputs; val-set utt/s)
    import time as _time

    def timed(fn, n=3):
        t0 = _time.perf_counter()
        for _ in range(n):
            fn()
        return len(lps) * n / (_time.perf_counter() - t0)

    dec_best = BeamSearchDecoder(tok, lm_path=word_arpa, beam_width=32,
                                 beam_alpha=0.6, beam_beta=0.5, cutoff_top_n=6)
    host_ups = timed(lambda: [dec_best.decode(lp[None, :ol])
                              for lp, ol in zip(lps, olens)])
    w_h, a_h, b_h = best_h
    hyb_ups = timed(lambda: decode_device_with_lm(
        lp_pad, ol_arr, tok, lm_path=word_arpa, alpha=a_h, beta=b_h,
        beam_width=16, cutoff_top_n=6))
    print(f'throughput: host beam+wordLM {host_ups:.1f} utt/s | '
          f'hybrid (device beam + host rescoring) {hyb_ups:.1f} utt/s '
          f'(hybrid best WER {w_h:.3f} at a={a_h} b={b_h})')


if __name__ == '__main__':
    main()
