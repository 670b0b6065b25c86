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


class TestBPEDecode:
    def test_greedy_decode_uses_training_blank(self, tokenizers):
        """eps_id must equal the training blank (C-1, models.py:323): build a
        posterior whose argmax path is [pieces of 'аб', blanks, pieces of
        'вг'] with blank = vocab_size-1 and check generate() round-trips."""
        from convasr_tpu.decode.generators import GreedyCTCGenerator
        _, bpe_tok = tokenizers
        C = bpe_tok.vocab_size
        blank = bpe_tok.eps_id
        assert blank == C - 1  # ADVICE r1: decode blank == training blank
        ids1 = bpe_tok.encode(['аб'])[0]
        ids2 = bpe_tok.encode(['вг'])[0]
        path = ids1 + [blank] * 3 + ids2 + [blank] * 2
        lp = np.full((1, len(path), C), -10.0, np.float32)
        for t, tok in enumerate(path):
            lp[0, t, tok] = 0.0
        gen = GreedyCTCGenerator()
        [[transcript]] = gen.generate(bpe_tok, lp, begin=np.zeros(1), end=np.ones(1))
        text = ' '.join(seg['hyp'] for seg in transcript).strip()
        assert text == 'аб вг'


class TestBpeDecoderConversion:
    def test_nested_convbn_head_converts(self, tokenizers, tmp_path):
        """Reference type='bpe' checkpoints nest decoder.1 as
        Sequential(ConvBn1d, ConvBn1d) (models.py:27-35); the converter must
        route decoder.1.{j}.conv/bn keys into decoder/bpe_conv{j}, not
        collapse them onto decoder/head1 (ADVICE r1)."""
        import torch
        from convasr_tpu.train.checkpoints import load_reference_checkpoint
        char_tok, bpe_tok = tokenizers
        model = dual_model(char_tok.vocab_size, bpe_tok.vocab_size)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 8).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        p = variables['params']['decoder']

        rng = np.random.RandomState(5)
        sd = {}
        sd['decoder.0.weight'] = torch.as_tensor(
            rng.randn(*np.asarray(p['head0']['kernel']).transpose(2, 1, 0).shape)
            .astype(np.float32))
        sd['decoder.0.bias'] = torch.as_tensor(
            rng.randn(*np.asarray(p['head0']['bias']).shape).astype(np.float32))
        for j in (0, 1):
            k = np.asarray(p[f'bpe_conv{j}']['conv0']['conv']['kernel'])
            cw = rng.randn(*k.transpose(2, 1, 0).shape).astype(np.float32)
            width = cw.shape[0]
            sd[f'decoder.1.{j}.conv.0.0.weight'] = torch.as_tensor(cw)
            sd[f'decoder.1.{j}.bn.0.weight'] = torch.as_tensor(
                rng.rand(width).astype(np.float32) + 0.5)
            sd[f'decoder.1.{j}.bn.0.bias'] = torch.as_tensor(
                rng.randn(width).astype(np.float32))
            sd[f'decoder.1.{j}.bn.0.running_mean'] = torch.as_tensor(
                rng.randn(width).astype(np.float32))
            sd[f'decoder.1.{j}.bn.0.running_var'] = torch.as_tensor(
                rng.rand(width).astype(np.float32) + 0.5)
            sd[f'decoder.1.{j}.bn.0.num_batches_tracked'] = torch.tensor(1)
        pt = str(tmp_path / 'bpe.pt')
        torch.save(dict(model_state_dict=sd), pt)

        converted, _ = load_reference_checkpoint(pt)
        dec = converted['params']['decoder']
        assert set(dec) == {'head0', 'bpe_conv0', 'bpe_conv1'}
        for j in (0, 1):
            got = dec[f'bpe_conv{j}']['conv0']['conv']['kernel']
            want = sd[f'decoder.1.{j}.conv.0.0.weight'].numpy().transpose(2, 1, 0)
            np.testing.assert_array_equal(got, want)
            bn = converted['batch_stats']['decoder'][f'bpe_conv{j}']['bn0']
            np.testing.assert_array_equal(
                bn['mean'], sd[f'decoder.1.{j}.bn.0.running_mean'].numpy())
        # converted decoder params slot into the Flax model and run
        merged_p = dict(variables['params']); merged_p['decoder'] = dec
        merged_bs = dict(variables.get('batch_stats', {}))
        merged_bs['decoder'] = converted['batch_stats']['decoder']
        out = model.apply({'params': merged_p, 'batch_stats': merged_bs}, x)
        assert np.isfinite(np.asarray(out['logits'][1])).all()
