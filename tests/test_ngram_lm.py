"""In-repo ARPA n-gram trainer (text/ngram_lm.py) — the KenLM lmplz
replacement (reference workflow: README.md:152-172).

Checks: the emitted ARPA normalizes (sum_w P(w|ctx) ~ 1 through the backoff
chain), count ordering is respected, our own ArpaLM/ C++ beam loader consume
it, and char-level LMs densify via char_lm_table.
"""
import math
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from convasr_tpu.decode.beam import ArpaLM, BeamSearchDecoder, char_lm_table, \
    prefix_beam_search
from convasr_tpu.text.ngram_lm import (EOS, UNK, char_tokenize, save_arpa,
                                       train_from_transcripts, train_ngram_lm)

CORPUS = [
    'the cat sat on the mat',
    'the cat ate the fish',
    'the dog sat on the log',
    'a cat and a dog',
    'the fish swam',
    'the cat sat',
] * 3 + ['a dog ate a fish']


def trained_lm(tmp_path, order=3, sentences=None):
    arpa = train_ngram_lm([s.split() for s in (sentences or CORPUS)], order=order)
    path = save_arpa(arpa, str(tmp_path / f'lm{order}.arpa'))
    return ArpaLM(path), arpa, path


def total_prob(lm, context, vocab):
    """sum_w P(w | context) over the full event space (vocab + </s> + <unk>)."""
    return sum(math.exp(lm.score(list(context) + [w]))
               for w in vocab + [EOS, UNK])


def test_arpa_normalizes(tmp_path):
    lm, arpa, _ = trained_lm(tmp_path, order=3)
    vocab = sorted(set(w for s in CORPUS for w in s.split()))
    for ctx in [(), ('the',), ('cat',), ('the', 'cat'), ('zzz',), ('dog', 'sat')]:
        s = total_prob(lm, ctx, vocab)
        assert 0.97 < s < 1.03, (ctx, s)


def test_frequency_ordering(tmp_path):
    lm, _, _ = trained_lm(tmp_path, order=2)
    # 'the' is the most frequent token; 'swam' is rare
    assert lm.score(['the']) > lm.score(['swam'])
    # seen bigram beats backed-off unseen bigram from the same context
    assert lm.score(['the', 'cat']) > lm.score(['the', 'swam'])
    # unk is scorable and small
    assert lm.score(['qqq']) < lm.score(['swam'])


def test_higher_order_context_helps(tmp_path):
    lm, _, _ = trained_lm(tmp_path, order=3)
    # 'sat on' is always followed by 'the' in training
    assert lm.score(['sat', 'on', 'the']) > lm.score(['on', 'the'])


def test_order1(tmp_path):
    lm, _, _ = trained_lm(tmp_path, order=1)
    vocab = sorted(set(w for s in CORPUS for w in s.split()))
    s = total_prob(lm, (), vocab)
    assert 0.97 < s < 1.03, s
    assert lm.score(['the']) > lm.score(['swam'])


def test_cpp_loader_consumes_trained_arpa(tmp_path):
    """The C++ beam (native/ctc_beam.cpp ARPA loader) must read our ARPA and
    match the python spec beam exactly on shared posteriors."""
    sentences = ['ab', 'ab ab', 'ba ab'] * 4
    arpa = train_ngram_lm([s.split() for s in sentences], order=2)
    path = save_arpa(arpa, str(tmp_path / 'words.arpa'))

    labels = ['a', 'b', ' ', '|']  # blank last
    rng = np.random.RandomState(0)
    logits = rng.randn(12, len(labels)).astype(np.float32) * 2.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    class Tok:
        vocab = labels
        eps_id = 3

    dec = BeamSearchDecoder(Tok(), lm_path=path, beam_width=8, beam_alpha=0.7,
                            beam_beta=0.3, cutoff_top_n=4,
                            blank_collapse_threshold=None)
    want = prefix_beam_search(lp, 3, beam_width=8, labels=labels,
                              lm=ArpaLM(path), alpha=0.7, beta=0.3,
                              cutoff_top_n=4, topk=1)[0][0]
    if dec.handle is None:  # no compiler in env: python fallback, still equal
        got = dec.decode(lp[None])[0]
    else:
        got = dec.decode(lp[None])[0]
    assert got == want, (got, want)


def test_char_level_lm_and_device_table(tmp_path):
    arpa = train_ngram_lm([char_tokenize(s) for s in CORPUS], order=2)
    path = save_arpa(arpa, str(tmp_path / 'char.arpa.gz'))
    lm = ArpaLM(path)
    vocab = ['a', 'c', 't', 'h', 'e', ' ', '|']
    table = char_lm_table(lm, vocab)
    assert table.shape == (len(vocab) + 1, len(vocab))
    assert np.isfinite(table).all()
    # 'h' follows 't' in 'the'; 'c' never follows 't' in the corpus
    t, h, c = vocab.index('t'), vocab.index('h'), vocab.index('c')
    assert table[t, h] > table[t, c]
    # the space row is real (SPACE_TOKEN round-trip), not the unk floor:
    # 'the ' makes e-><sp> common; words start with 't' but never with 'e'
    e, sp = vocab.index('e'), vocab.index(' ')
    assert table[e, sp] > table[e, c]
    assert table[sp, t] > table[sp, e]


def test_train_from_transcripts(tmp_path):
    import json
    j = tmp_path / 'tr.json'
    json.dump([dict(audio_path='x.wav', ref='The cat sat'),
               dict(audio_path='y.wav', ref='the dog sat')], open(j, 'w'))
    txt = tmp_path / 'tr.txt'
    txt.write_text('the fish swam\nthe cat ate\n')
    arpa = train_from_transcripts([str(j), str(txt)], order=2)
    lm = ArpaLM(save_arpa(arpa, str(tmp_path / 'mix.arpa')))
    # (unigram KN continuation counts tie on 4 sentences — compare bigrams)
    assert lm.score(['the', 'cat']) > lm.score(['the', 'swam'])
    assert lm.order == 2
