"""Learned voice-activity detector (neural SAD).

The reference wires a pyannote speech-activity-detection pipeline for
diarization (/root/reference/diarization.py:36-45) next to webrtcvad
(/root/reference/vad.py:12-25). Neither library ships in this image, and the
energy VAD (audio/vad.py) degrades at low SNR — a loud noise floor looks
like speech to a dual-threshold energy rule. This module closes the gap
TPU-natively: a ~15k-parameter conv net over log-band energies, trained
in-repo on synthetic speech/noise mixtures (no external corpora in the
image), produces per-frame speech posteriors; the whole featurize+forward
runs as ONE jit on device for long audio.

Interfaces match audio/vad.py: `NeuralVAD.mask(signal, sr)` returns the same
per-sample boolean mask `detect_speech` produces, so every downstream
consumer (VAD chunking in cli/transcribe.py, diarization SAD, serve
endpointing) can swap backends without change. Train/save/load:

    python -m convasr_tpu.audio.neural_vad --train /path/vad.npz
    model = NeuralVADModel.load('/path/vad.npz')
    mask = model.mask(signal, sample_rate)       # (C, T) bool
"""
import argparse
import typing

import numpy as np

FRAME_SEC = 0.02
N_BANDS = 16


def _band_matrix(n_fft_bins: int, bands: int = N_BANDS) -> np.ndarray:
    """Triangular log-spaced band pooling (mel-like, self-contained)."""
    edges = np.unique(np.geomspace(2, n_fft_bins - 1, bands + 2).astype(int))
    while len(edges) < bands + 2:        # tiny n_fft: pad with linear edges
        edges = np.unique(np.concatenate([edges, [edges[-1] + 1]]))
    m = np.zeros((n_fft_bins, bands), np.float32)
    for b in range(bands):
        lo, mid, hi = edges[b], edges[b + 1], edges[b + 2]
        if mid > lo:
            m[lo:mid, b] = np.linspace(0, 1, mid - lo, endpoint=False)
        m[mid:hi, b] = np.linspace(1, 0, hi - mid, endpoint=False)
    return m


def featurize(signal, sample_rate: int):
    """(B, T) float32 -> (B, frames, N_BANDS+1) log-band energies + frame
    log-RMS, normalized per utterance (jnp; jit-friendly, static shapes)."""
    import jax.numpy as jnp
    frame = int(FRAME_SEC * sample_rate)
    B, T = signal.shape
    n = T // frame
    x = signal[:, :n * frame].reshape(B, n, frame)
    spec = jnp.abs(jnp.fft.rfft(x, axis=-1)) ** 2           # (B, n, frame//2+1)
    bandm = jnp.asarray(_band_matrix(frame // 2 + 1))
    bands = jnp.log(spec @ bandm + 1e-8)
    rms = jnp.log(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-8)
    feats = jnp.concatenate([bands, rms], -1)
    mu = jnp.mean(feats, axis=1, keepdims=True)
    sd = jnp.std(feats, axis=1, keepdims=True) + 1e-5
    return (feats - mu) / sd


def make_model(hidden: int = 32):
    import flax.linen as nn

    class NeuralVAD(nn.Module):
        @nn.compact
        def __call__(self, feats):                  # (B, T, F)
            x = nn.Conv(hidden, (5,))(feats)
            x = nn.relu(x)
            x = nn.Conv(hidden, (5,))(x)
            x = nn.relu(x)
            return nn.Dense(1)(x)[..., 0]           # per-frame logits (B, T)

    return NeuralVAD()


# ---------------------------------------------------------------- synthesis

def _speech_like(rng, n, sample_rate):
    """Harmonic stack with random AM envelope — crude vocalic structure."""
    t = np.arange(n) / sample_rate
    f0 = rng.uniform(80, 300)
    sig = np.zeros(n, np.float32)
    for h in range(1, rng.randint(3, 6)):
        sig += rng.uniform(0.3, 1.0) / h * np.sin(
            2 * np.pi * f0 * h * t + rng.uniform(0, 6.28))
    env = np.abs(np.interp(np.arange(n), np.linspace(0, n, 8),
                           rng.uniform(0.2, 1.0, 8)))
    return (sig * env).astype(np.float32)


def _noise_like(rng, n, sample_rate):
    kind = rng.randint(3)
    if kind == 0:                                   # white
        return rng.randn(n).astype(np.float32)
    if kind == 1:                                   # low-pass (rumble)
        x = np.cumsum(rng.randn(n)).astype(np.float32)
        return x / (np.abs(x).max() + 1e-6) * 3
    return np.sin(2 * np.pi * rng.uniform(40, 60)   # mains hum
                  * np.arange(n) / sample_rate).astype(np.float32)


def synth_batch(rng, batch: int, seconds: float, sample_rate: int):
    """Labeled mixtures: alternating speech/nonspeech segments + noise at
    random SNR. Returns (B, T) signal, (B, frames) 0/1 labels."""
    T = int(seconds * sample_rate)
    frame = int(FRAME_SEC * sample_rate)
    frames = T // frame
    sig = np.zeros((batch, T), np.float32)
    lab = np.zeros((batch, frames), np.float32)
    for b in range(batch):
        pos = 0
        speech = rng.rand() < 0.5
        while pos < T:
            seg = int(rng.uniform(0.3, 1.5) * sample_rate)
            seg = min(seg, T - pos)
            if speech:
                sig[b, pos:pos + seg] = _speech_like(rng, seg, sample_rate)
                lab[b, pos // frame:(pos + seg) // frame] = 1.0
            pos += seg
            speech = not speech
        snr_db = rng.uniform(0, 25)
        noise = _noise_like(rng, T, sample_rate)
        sp = np.sqrt(np.mean(sig[b] ** 2) + 1e-9)
        np_ = np.sqrt(np.mean(noise ** 2) + 1e-9)
        sig[b] += noise * (sp / np_ / (10 ** (snr_db / 20) + 1e-9))
        sig[b] *= rng.uniform(0.05, 0.9) / (np.abs(sig[b]).max() + 1e-6)
    return sig, lab


# ------------------------------------------------------------------- train

def train(sample_rate: int = 8000, steps: int = 300, batch: int = 16,
          seconds: float = 3.0, seed: int = 0, lr: float = 3e-3,
          log_every: int = 50) -> dict:
    """Train on synthetic mixtures; returns {'params': ..., 'sample_rate'}."""
    import jax
    import jax.numpy as jnp
    import optax

    model = make_model()
    rng = np.random.RandomState(seed)
    x0, _ = synth_batch(rng, batch, seconds, sample_rate)
    params = model.init(jax.random.PRNGKey(seed),
                        featurize(jnp.asarray(x0), sample_rate))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, featurize(x, sample_rate))
            return optax.sigmoid_binary_cross_entropy(logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        x, y = synth_batch(rng, batch, seconds, sample_rate)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x), jnp.asarray(y))
        if log_every and (i + 1) % log_every == 0:
            print(f'step {i + 1}/{steps} bce {float(loss):.4f}')
    return dict(params=params, sample_rate=sample_rate)


class NeuralVADModel:
    """Inference wrapper with the audio/vad.py mask contract."""

    def __init__(self, params, sample_rate: int):
        self.params = params
        self.sample_rate = sample_rate
        self.model = make_model()
        self._jit = None

    def frame_probs(self, signal: np.ndarray) -> np.ndarray:
        """(C, T) -> (C, frames) speech posteriors."""
        import jax
        import jax.numpy as jnp
        if self._jit is None:
            self._jit = jax.jit(lambda p, x: jax.nn.sigmoid(
                self.model.apply(p, featurize(x, self.sample_rate))))
        return np.asarray(self._jit(self.params, jnp.atleast_2d(
            np.asarray(signal, np.float32))))

    def mask(self, signal: np.ndarray, sample_rate: int,
             threshold: float = 0.5) -> np.ndarray:
        """(C, T) float32 -> (C, T) per-sample bool mask (detect_speech
        contract, reference vad.py:12-25)."""
        assert sample_rate == self.sample_rate, \
            (sample_rate, self.sample_rate)
        signal = np.atleast_2d(np.asarray(signal, np.float32))
        frame = int(FRAME_SEC * sample_rate)
        probs = self.frame_probs(signal)
        per_frame = probs > threshold
        mask = np.repeat(per_frame, frame, axis=1)
        # pad/trim to the exact sample count (trailing partial frame copies
        # the last frame's decision)
        T = signal.shape[1]
        if mask.shape[1] < T:
            tail = np.repeat(mask[:, -1:], T - mask.shape[1], axis=1) \
                if mask.size else np.zeros((signal.shape[0], T - mask.shape[1]), bool)
            mask = np.concatenate([mask, tail], axis=1)
        return mask[:, :T]

    def save(self, path: str):
        import jax
        flat = {'/'.join(map(str, k)): np.asarray(v) for k, v in
                jax.tree_util.tree_flatten_with_path(self.params)[0]}
        np.savez(path, __sample_rate=self.sample_rate, **flat)

    @classmethod
    def load(cls, path: str) -> 'NeuralVADModel':
        import jax
        import jax.numpy as jnp
        data = np.load(path)
        sample_rate = int(data['__sample_rate'])
        model = make_model()
        dummy = featurize(jnp.zeros((1, sample_rate)), sample_rate)
        template = model.init(jax.random.PRNGKey(0), dummy)
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        params = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(data['/'.join(map(str, k))])
                      for k, _ in leaves])
        return cls(params, sample_rate)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--train', metavar='OUT.npz', required=True)
    ap.add_argument('--sample-rate', type=int, default=8000)
    ap.add_argument('--steps', type=int, default=300)
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--device', default='cpu', choices=['cpu', 'tpu', 'axon'])
    args = ap.parse_args()
    from ..infra.utils import select_device
    select_device(args.device)
    state = train(sample_rate=args.sample_rate, steps=args.steps,
                  batch=args.batch, seed=args.seed)
    NeuralVADModel(state['params'], state['sample_rate']).save(args.train)
    print('saved', args.train)


if __name__ == '__main__':
    main()
