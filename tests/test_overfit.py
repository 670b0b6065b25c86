"""End-to-end learning test: overfit a tiny model on synthetic data.

Validates that the full pipeline (model -> Pallas/scan CTC loss -> NovoGrad ->
greedy decode -> CER) actually learns: on a deterministic char->feature
mapping, training must drive CER toward zero.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from convasr_tpu.metrics import cer
from convasr_tpu.models.jasper import JasperNet
from convasr_tpu.ops.ctc import greedy_decode
from convasr_tpu.train.loop import init_train_state, make_optimizer_with_accum, make_train_step
from convasr_tpu.train.optim import make_optimizer

VOCAB = 'абвг'  # + blank as last class
C = len(VOCAB) + 1
FEAT = 8


def synth_utterance(rng, text):
    """Each char -> 4 frames of a char-specific feature pattern + 2 noise
    frames of silence between chars."""
    frames = []
    for ch in text:
        idx = VOCAB.index(ch)
        pattern = np.zeros(FEAT, np.float32)
        pattern[idx] = 2.0
        pattern[(idx + 4) % FEAT] = -2.0
        frames.extend([pattern + 0.05 * rng.randn(FEAT) for _ in range(4)])
        frames.extend([0.05 * rng.randn(FEAT).astype(np.float32) for _ in range(2)])
    return np.stack(frames).astype(np.float32)


@pytest.mark.slow
class TestOverfit:
    def test_cer_drops_to_zero(self):
        rng = np.random.RandomState(0)
        texts = ['абв', 'вга', 'ба', 'гваб', 'авг', 'бг', 'гб', 'ваб']
        L = max(len(t) for t in texts)
        T = max(len(t) for t in texts) * 6

        xs = np.zeros((len(texts), T, FEAT), np.float32)
        ys = np.zeros((len(texts), 1, L), np.int64)
        ylens = np.zeros((len(texts), 1), np.int64)
        xlens = np.zeros(len(texts), np.float32)
        for i, text in enumerate(texts):
            utt = synth_utterance(rng, text)
            xs[i, :len(utt)] = utt
            xlens[i] = len(utt) / T
            ys[i, 0, :len(text)] = [VOCAB.index(c) for c in text]
            ylens[i, 0] = len(text)
        batch = dict(x=jnp.asarray(xs), xlen=jnp.asarray(xlens),
                     y=jnp.asarray(ys), ylen=jnp.asarray(ylens))

        model = JasperNet(num_input_features=FEAT, num_classes=(C,), repeat=1,
                          num_subblocks=1, residual='dense', kernel_sizes=(5,),
                          kernel_size_prologue=5, kernel_size_epilogue=5, base_width=8,
                          out_width_factors=(2,), out_width_factors_large=(3, 3),
                          dropout=0.0, temporal_mask=False, stride1=1,
                          normalize_features=False)
        optimizer = make_optimizer_with_accum(
            make_optimizer('novograd', lambda s: 0.02, betas=(0.9, 0.98)))
        state = init_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, optimizer), donate_argnums=(0,))

        losses = []
        for i in range(300):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            if i % 50 == 0:
                losses.append(float(metrics['loss']))
        assert losses[-1] < losses[0]

        outputs = model.apply({'params': state.params, 'batch_stats': state.batch_stats},
                              batch['x'], xlen=batch['xlen'])
        tokens = np.asarray(greedy_decode(outputs['log_probs'][0]))
        olen = np.asarray(outputs['olen'][0])

        def collapse(ids, n):
            out, prev = [], None
            for t in ids[:n]:
                if t != prev and t != C - 1:
                    out.append(int(t))
                prev = t
            return ''.join(VOCAB[i] for i in out)

        hyps = [collapse(tokens[i], olen[i]) for i in range(len(texts))]
        cers = [cer(hyp=h, ref=r) for h, r in zip(hyps, texts)]
        assert float(np.mean(cers)) < 0.2, list(zip(hyps, texts))

    def test_learns_with_spec_augment(self):
        """SpecAugment wired through the train step (VERDICT r1 #4): loss must
        still go down with masks on, and eval must be mask-free."""
        rng = np.random.RandomState(1)
        texts = ['абв', 'вга', 'ба', 'гваб']
        L = max(len(t) for t in texts)
        T = max(len(t) for t in texts) * 6
        xs = np.zeros((len(texts), T, FEAT), np.float32)
        ys = np.zeros((len(texts), 1, L), np.int64)
        ylens = np.zeros((len(texts), 1), np.int64)
        xlens = np.zeros(len(texts), np.float32)
        for i, text in enumerate(texts):
            utt = synth_utterance(rng, text)
            xs[i, :len(utt)] = utt
            xlens[i] = len(utt) / T
            ys[i, 0, :len(text)] = [VOCAB.index(c) for c in text]
            ylens[i, 0] = len(text)
        batch = dict(x=jnp.asarray(xs), xlen=jnp.asarray(xlens),
                     y=jnp.asarray(ys), ylen=jnp.asarray(ylens))

        model = JasperNet(num_input_features=FEAT, num_classes=(C,), repeat=1,
                          num_subblocks=1, residual='dense', kernel_sizes=(5,),
                          kernel_size_prologue=5, kernel_size_epilogue=5, base_width=8,
                          out_width_factors=(2,), out_width_factors_large=(3, 3),
                          dropout=0.0, temporal_mask=False, stride1=1,
                          normalize_features=False,
                          spec_augment=(1, 3, 1, 2))
        optimizer = make_optimizer_with_accum(
            make_optimizer('novograd', lambda s: 0.02, betas=(0.9, 0.98)))
        state = init_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, optimizer), donate_argnums=(0,))
        first = last = None
        for i in range(150):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            if i == 0:
                first = float(metrics['loss'])
        last = float(metrics['loss'])
        assert np.isfinite(last) and last < first

        # eval path (training=False) must not need the 'augment' rng and must
        # be deterministic (no masks)
        out1 = model.apply({'params': state.params, 'batch_stats': state.batch_stats},
                           batch['x'], xlen=batch['xlen'])
        out2 = model.apply({'params': state.params, 'batch_stats': state.batch_stats},
                           batch['x'], xlen=batch['xlen'])
        np.testing.assert_array_equal(np.asarray(out1['log_probs'][0]),
                                      np.asarray(out2['log_probs'][0]))


class TestSpecAugmentMasks:
    def test_masks_zero_regions_training_only(self):
        """The augment branch actually zeroes features under training=True."""
        model = JasperNet(num_input_features=FEAT, num_classes=(C,), repeat=1,
                          num_subblocks=1, residual='dense', kernel_sizes=(5,),
                          kernel_size_prologue=5, kernel_size_epilogue=5, base_width=8,
                          out_width_factors=(2,), out_width_factors_large=(3, 3),
                          dropout=0.0, temporal_mask=False, stride1=1,
                          normalize_features=False,
                          spec_augment=(2, 8, 2, 3))
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 24, FEAT).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        det = model.apply(variables, x)
        aug = model.apply(variables, x, training=True, mutable=['batch_stats'],
                          rngs={'dropout': jax.random.PRNGKey(1),
                                'augment': jax.random.PRNGKey(2)})[0]
        # masked features change the logits vs the deterministic pass
        assert not np.allclose(np.asarray(det['log_probs'][0]),
                               np.asarray(aug['log_probs'][0]))
