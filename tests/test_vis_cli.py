"""Vis CLI smoke tests."""
import json
import os

import numpy as np
import pytest

from convasr_tpu.audio import write_audio
from convasr_tpu.cli.vis import main


@pytest.fixture
def transcript_json(tmp_path):
    sr = 8000
    wav = str(tmp_path / 'a.wav')
    write_audio(wav, (0.1 * np.random.RandomState(0).randn(1, sr)).astype(np.float32), sr)
    data = [dict(audio_path=wav, ref='привет', hyp='превет', begin=0.0, end=1.0,
                 cer=0.17, channel=0, speaker=1, speaker_name='A', labels_name='char_legacy')]
    path = str(tmp_path / 't.json')
    with open(path, 'w') as f:
        json.dump(data, f, ensure_ascii=False)
    return path


class TestVisCLI:
    def test_transcript(self, transcript_json, capsys, tmp_path):
        out = str(tmp_path / 'view.html')
        main(['transcript', transcript_json, '-o', out])
        html = open(out).read()
        assert 'превет' in html and 'audio' in html

    def test_errors(self, transcript_json, tmp_path):
        out = str(tmp_path / 'errors.html')
        main(['errors', transcript_json, transcript_json, '-o', out])
        assert 'привет' in open(out).read()

    def test_label(self, transcript_json, tmp_path, capsys):
        main(['label', transcript_json])
        assert os.path.exists(transcript_json + '.label.html')

    def test_summary(self, transcript_json, capsys):
        main(['summary', transcript_json])
        assert 'utt' in capsys.readouterr().out

    def test_tabulate(self, tmp_path, capsys):
        exp = tmp_path / 'exp' / 'run'
        os.makedirs(exp)
        for it in [100, 200]:
            with open(exp / f'transcripts_val_epoch00_iter{it:07d}.json', 'w') as f:
                json.dump([dict(cer=0.2, labels_name='char_legacy')], f)
        main(['tabulate', '--experiments-dir', str(tmp_path / 'exp'),
              '--experiment-id', 'run'])
        out = capsys.readouterr().out
        assert 'iteration' in out and '0.2000' in out

    def test_logits(self, tmp_path):
        logits_path = str(tmp_path / 'l.npz')
        np.savez(logits_path, logits_0=np.random.RandomState(0).randn(20, 8),
                 ref='привет', hyp='превет', audio_path='a.wav')
        try:
            main(['logits', logits_path])
        except RuntimeError as e:
            pytest.skip(f'matplotlib unavailable: {e}')
        assert os.path.exists(logits_path + '.html')
