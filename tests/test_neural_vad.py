"""Learned SAD (audio/neural_vad.py): trains on synthetic mixtures, beats
the energy VAD at low SNR, save/load roundtrip, detect_speech contract."""
import numpy as np
import pytest

from convasr_tpu.audio import neural_vad
from convasr_tpu.audio.neural_vad import NeuralVADModel, synth_batch, train
from convasr_tpu.audio.vad import detect_speech

SR = 8000


@pytest.fixture(scope='module')
def trained():
    state = train(sample_rate=SR, steps=200, batch=8, seconds=2.0, seed=0,
                  log_every=0)
    return NeuralVADModel(state['params'], SR)


def frame_labels_accuracy(model_mask, labels, frame):
    n = min(model_mask.shape[1] // frame, labels.shape[1])
    per_frame = model_mask[:, :n * frame].reshape(
        model_mask.shape[0], n, frame).mean(-1) > 0.5
    return (per_frame == (labels[:, :n] > 0.5)).mean()


class TestNeuralVAD:
    def test_learns_and_beats_energy_at_low_snr(self, trained):
        rng = np.random.RandomState(99)
        frame = int(neural_vad.FRAME_SEC * SR)
        # held-out LOW-SNR mixtures: loud noise floors are exactly where the
        # dual-threshold energy rule fails
        sig, lab = synth_batch(rng, 8, 3.0, SR)
        neural_acc = frame_labels_accuracy(trained.mask(sig, SR), lab, frame)
        energy_mask = detect_speech(sig, SR, window_size=neural_vad.FRAME_SEC,
                                    backend='energy')
        energy_acc = frame_labels_accuracy(energy_mask, lab, frame)
        assert neural_acc > 0.80, neural_acc
        assert neural_acc > energy_acc, (neural_acc, energy_acc)

    def test_mask_contract(self, trained):
        sig = np.random.RandomState(0).randn(2, SR * 2 + 37).astype(np.float32)
        mask = trained.mask(sig, SR)
        assert mask.shape == sig.shape and mask.dtype == bool
        # 1-D input also accepted (atleast_2d, detect_speech spec)
        m1 = trained.mask(sig[0], SR)
        assert m1.shape == (1, sig.shape[1])

    def test_save_load_roundtrip(self, trained, tmp_path):
        path = str(tmp_path / 'vad.npz')
        trained.save(path)
        loaded = NeuralVADModel.load(path)
        sig = np.random.RandomState(1).randn(1, SR).astype(np.float32) * 0.1
        np.testing.assert_array_equal(trained.mask(sig, SR),
                                      loaded.mask(sig, SR))

    def test_detect_speech_neural_backend(self, trained):
        sig, _ = synth_batch(np.random.RandomState(2), 1, 2.0, SR)
        mask = detect_speech(sig, SR, window_size=0.02, backend='neural',
                             neural_model=trained)
        assert mask.shape == sig.shape and mask.dtype == bool
        with pytest.raises(AssertionError):
            detect_speech(sig, SR, window_size=0.02, backend='neural')
