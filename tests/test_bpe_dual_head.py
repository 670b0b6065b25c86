"""Dual-head (char + BPE) model training path, end to end.

Covers the reference's two-pipeline setup (--text-pipelines char_legacy bpe;
Decoder type='bpe' models.py:27-35; per-head CTC losses summed
models.py:320-325; bpe_only flag models.py:1422-1424).
"""
import json
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convasr_tpu.models.jasper import JasperNet
from convasr_tpu.text import BPETokenizer, CharTokenizer, train_bpe
from convasr_tpu.train.loop import init_train_state, make_optimizer_with_accum, make_train_step
from convasr_tpu.train.optim import make_optimizer

ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope='module')
def tokenizers():
    char_tok = CharTokenizer('абвг')
    corpus = ['аб вг', 'абв где'.replace('д', 'а').replace('е', 'б'), 'ва гб'] * 5
    bpe_tok = BPETokenizer(train_bpe(corpus, vocab_size=24))
    return char_tok, bpe_tok


def dual_model(char_classes, bpe_classes):
    return JasperNet(num_input_features=8, num_classes=(char_classes, bpe_classes),
                     repeat=1, num_subblocks=1, residual='dense', kernel_sizes=(3,),
                     kernel_size_prologue=3, kernel_size_epilogue=3, base_width=4,
                     out_width_factors=(2,), out_width_factors_large=(3, 3),
                     dropout=0.0, temporal_mask=False, stride1=1,
                     normalize_features=False, decoder_type='bpe')


class TestDualHead:
    def test_two_heads_output(self, tokenizers):
        char_tok, bpe_tok = tokenizers
        model = dual_model(char_tok.vocab_size, bpe_tok.vocab_size)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 8).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert len(out['logits']) == 2
        assert out['logits'][0].shape[-1] == char_tok.vocab_size
        assert out['logits'][1].shape[-1] == bpe_tok.vocab_size

    def _batch(self, tokenizers, rng):
        char_tok, bpe_tok = tokenizers
        texts = ['аб вг', 'ва гб']
        L = 8
        y = np.zeros((2, 2, L), np.int64)
        ylen = np.zeros((2, 2), np.int64)
        for i, text in enumerate(texts):
            for h, tok in enumerate([char_tok, bpe_tok]):
                ids = tok.encode([text])[0][:L]
                y[i, h, :len(ids)] = ids
                ylen[i, h] = len(ids)
        return dict(x=jnp.asarray(rng.randn(2, 32, 8).astype(np.float32)),
                    xlen=jnp.ones((2,), jnp.float32),
                    y=jnp.asarray(y), ylen=jnp.asarray(ylen))

    def test_train_step_both_heads(self, tokenizers):
        char_tok, bpe_tok = tokenizers
        model = dual_model(char_tok.vocab_size, bpe_tok.vocab_size)
        rng = np.random.RandomState(1)
        batch = self._batch(tokenizers, rng)
        optimizer = make_optimizer_with_accum(make_optimizer('sgd', lambda s: 1e-3))
        state = init_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, optimizer))
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics['loss']))

    def test_bpe_only_loss_excludes_char_head(self, tokenizers):
        char_tok, bpe_tok = tokenizers
        model = dual_model(char_tok.vocab_size, bpe_tok.vocab_size)
        rng = np.random.RandomState(2)
        batch = self._batch(tokenizers, rng)
        variables = model.init(jax.random.PRNGKey(0), batch['x'], xlen=batch['xlen'])
        from convasr_tpu.train.loop import compute_losses
        out = model.apply(variables, batch['x'], xlen=batch['xlen'])
        both = np.asarray(compute_losses(out, batch['y'], batch['ylen'], bpe_only=False))
        bpe_only = np.asarray(compute_losses(out, batch['y'], batch['ylen'], bpe_only=True))
        assert (both > bpe_only).all()  # char-head loss removed
