"""Full-stack learning test on RAW AUDIO: tones -> log-mel -> JasperNet ->
CTC -> NovoGrad -> greedy decode -> text.

Each character is a distinct pure tone; a model trained on wave files must
transcribe held-in utterances with low CER. This exercises the complete
signal path (frontend framing/mel/instance-norm + conv stack + loss +
optimizer + tokenizer decode) rather than synthetic features.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convasr_tpu.frontend.logmel import LogFilterBankFrontend
from convasr_tpu.metrics import cer
from convasr_tpu.models.jasper import JasperNet
from convasr_tpu.ops.ctc import greedy_decode
from convasr_tpu.text import CharTokenizer
from convasr_tpu.train.loop import init_train_state, make_optimizer_with_accum, make_train_step
from convasr_tpu.train.optim import make_optimizer

SR = 8000
VOCAB = 'абвг'
TONES = {c: 500 + 400 * i for i, c in enumerate(VOCAB)}  # Hz per char


def synth_wave(rng, text, char_sec=0.08, gap_sec=0.04):
    chunks = []
    for ch in text:
        t = np.arange(int(SR * char_sec)) / SR
        tone = 0.5 * np.sin(2 * np.pi * TONES[ch] * t)
        chunks.append(tone + 0.01 * rng.randn(len(t)))
        chunks.append(0.01 * rng.randn(int(SR * gap_sec)))
    return np.concatenate(chunks).astype(np.float32)


@pytest.mark.slow
class TestAudioLearning:
    def test_model_learns_tone_alphabet(self):
        rng = np.random.RandomState(0)
        tok = CharTokenizer(VOCAB)
        texts = ['аб', 'вг', 'га', 'бв', 'аг', 'вб', 'бга', 'авг']
        L = 3
        T = int(SR * (3 * 0.12 + 0.04))
        T = (T // 128) * 128

        B = len(texts)
        xs = np.zeros((B, T), np.float32)
        xlens = np.zeros(B, np.float32)
        ys = np.zeros((B, 1, L), np.int64)
        ylens = np.zeros((B, 1), np.int64)
        for i, text in enumerate(texts):
            w = synth_wave(rng, text)[:T]
            xs[i, :len(w)] = w
            xlens[i] = len(w) / T
            ids = tok.encode([text])[0]
            ys[i, 0, :len(ids)] = ids
            ylens[i, 0] = len(ids)
        batch = dict(x=jnp.asarray(xs), xlen=jnp.asarray(xlens),
                     y=jnp.asarray(ys), ylen=jnp.asarray(ylens))

        frontend = LogFilterBankFrontend(out_channels=16, sample_rate=SR,
                                         window_size=0.02, window_stride=0.01,
                                         dither=0.0)
        model = JasperNet(num_input_features=16, num_classes=(tok.vocab_size,),
                          repeat=1, num_subblocks=1, residual='dense',
                          kernel_sizes=(5,), kernel_size_prologue=5,
                          kernel_size_epilogue=5, base_width=6,
                          out_width_factors=(2,), out_width_factors_large=(3, 3),
                          dropout=0.0, temporal_mask=False, stride1=2,
                          frontend=frontend)
        optimizer = make_optimizer_with_accum(
            make_optimizer('novograd', lambda s: 0.02, betas=(0.9, 0.98)))
        state = init_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, optimizer), donate_argnums=(0,))

        first_loss = None
        for i in range(250):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            if first_loss is None:
                first_loss = float(metrics['loss'])
        assert float(metrics['loss']) < first_loss

        outputs = model.apply({'params': state.params, 'batch_stats': state.batch_stats},
                              batch['x'], xlen=batch['xlen'])
        tokens = np.asarray(greedy_decode(outputs['log_probs'][0]))
        olen = np.asarray(outputs['olen'][0])

        def collapse(ids, n):
            out, prev = [], None
            for t in ids[:n]:
                if t != prev and t != tok.eps_id:
                    out.append(int(t))
                prev = t
            return tok.decode([out])[0]

        hyps = [collapse(tokens[i], olen[i]) for i in range(B)]
        cers = [cer(hyp=h.replace(' ', ''), ref=r) for h, r in zip(hyps, texts)]
        assert float(np.mean(cers)) < 0.25, list(zip(hyps, texts))
