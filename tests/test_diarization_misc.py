"""Diarization, exphtml, metrics CLI, audio CLI tests."""
import json
import os

import numpy as np
import pytest


class TestRle:
    def test_rle1d(self):
        from convasr_tpu.audio.diarization import rle1d
        starts, lengths, values = rle1d(np.array([1, 1, 0, 0, 0, 1]))
        assert starts.tolist() == [0, 2, 5]
        assert lengths.tolist() == [2, 3, 1]
        assert values.tolist() == [1, 0, 1]


class TestSelectSpeaker:
    def _stereo(self, sr=8000):
        rng = np.random.RandomState(0)
        t = np.arange(sr, dtype=np.float32) / sr
        tone = np.sin(2 * np.pi * 300 * t).astype(np.float32)
        quiet = (0.001 * rng.randn(sr)).astype(np.float32)
        # speaker A (ch0) in 1st second, speaker B (ch1) in 2nd second
        ch0 = np.concatenate([0.8 * tone, quiet])
        ch1 = np.concatenate([quiet, 0.8 * tone])
        return np.stack([ch0, ch1])

    def test_two_speakers_detected(self):
        from convasr_tpu.audio.diarization import select_speaker
        sig = self._stereo()
        speaker_id, masks = select_speaker(sig, kernel_size_smooth_silence=512,
                                           kernel_size_smooth_signal=128,
                                           kernel_size_smooth_speaker=1024,
                                           silence_absolute_threshold=0.05,
                                           silence_relative_threshold=0.2)
        sr = 8000
        # first second dominated by speaker 1, second by speaker 2
        first = speaker_id[sr // 4: 3 * sr // 4]
        second = speaker_id[sr + sr // 4: sr + 3 * sr // 4]
        assert (first == 1).mean() > 0.8
        assert (second == 2).mean() > 0.8
        assert masks.shape[0] == 3


class TestSpeakerError:
    def test_perfect_match(self):
        from convasr_tpu.audio.diarization import speaker_error, der
        ref = [dict(begin=0.0, end=1.0, speaker=1), dict(begin=1.0, end=2.0, speaker=2)]
        err, perm = speaker_error(ref=ref, hyp=ref, num_speakers=2, sample_rate=100)
        assert err == 0.0
        assert der(ref, ref, 100) == 0.0

    def test_permutation_found(self):
        from convasr_tpu.audio.diarization import speaker_error
        ref = [dict(begin=0.0, end=1.0, speaker=1), dict(begin=1.0, end=2.0, speaker=2)]
        hyp = [dict(begin=0.0, end=1.0, speaker=2), dict(begin=1.0, end=2.0, speaker=1)]
        err, perm = speaker_error(ref=ref, hyp=hyp, num_speakers=2, sample_rate=100)
        assert err == 0.0
        assert perm == [0, 2, 1]

    def test_miss_counted(self):
        from convasr_tpu.audio.diarization import der
        ref = [dict(begin=0.0, end=2.0, speaker=1)]
        hyp = [dict(begin=0.0, end=1.0, speaker=1)]
        assert der(ref, hyp, 100) == pytest.approx(0.5, abs=0.02)


class TestExpHtml:
    def test_expjson_and_exphtml(self, tmp_path):
        from convasr_tpu.infra.exphtml import expjson, exphtml
        root = str(tmp_path)
        expjson(root, 'exp1', epoch=0, iteration=100, columns=dict(cer=0.25, wer=0.5),
                git_revision=False, name='a.json')
        expjson(root, 'exp1', epoch=0, iteration=200, columns=dict(cer=0.20, wer=0.4),
                git_revision=False, name='b.json')
        html_path = exphtml(root)
        html = open(html_path).read()
        assert 'exp1' in html and 'cer' in html and '0.2000' in html

    def test_hidden_columns_and_tags(self, tmp_path):
        from convasr_tpu.infra.exphtml import expjson, exphtml
        root = str(tmp_path)
        # '.debug' column is hidden-by-default (reference strip_hidden/hide
        # convention); tag rows are toggleable
        expjson(root, 'exp1', epoch=0, iteration=100,
                columns={'cer': 0.25, '.debug': 1.0}, tag='baseline',
                git_revision=False, name='a.json')
        expjson(root, 'exp1', epoch=0, iteration=200,
                columns={'cer': 0.20}, tag='tuned',
                git_revision=False, name='b.json')
        html = open(exphtml(root)).read()
        assert 'class="col-debug" hidden' in html      # hidden column cells
        assert 'class="col-cer">' in html              # visible column
        assert 'tag-baseline' in html and 'tag-tuned' in html
        assert 'toggle(".col-debug")' in html          # toggle link
        assert 'toggle(".tag-baseline")' in html

    def test_git_push_noop_without_repo(self, tmp_path):
        from convasr_tpu.infra.exphtml import git_push_dashboard
        assert git_push_dashboard(str(tmp_path)) is False


class TestMetricsCLI:
    def test_analyze(self, capsys):
        from convasr_tpu.cli.metrics import main
        main(['analyze', '--hyp', 'превет мир', '--ref', 'привет мир',
              '--text-config', 'configs/ru_text_config.json',
              '--val-config', 'configs/ru_val_config.json',
              '--vocab', '/nonexistent'])
        out = json.loads(capsys.readouterr().out)
        assert out['wer'] == pytest.approx(0.5)

    def test_align(self, capsys):
        from convasr_tpu.cli.metrics import main
        main(['align', '--hyp', 'превет мир', '--ref', 'привет мир'])
        out = capsys.readouterr().out
        assert 'hyp:' in out and 'ref:' in out

    def test_analyze_file(self, tmp_path, capsys):
        from convasr_tpu.cli.metrics import main
        input_file = str(tmp_path / 'pairs.json')
        with open(input_file, 'w') as f:
            json.dump([dict(hyp='превет', ref='привет', audio_path='a.wav')], f,
                      ensure_ascii=False)
        out_file = str(tmp_path / 'out.json')
        main(['analyze-file', '--input-file', input_file, '--output-file', out_file,
              '--text-config', 'configs/ru_text_config.json',
              '--val-config', 'configs/ru_val_config.json', '--vocab', '/nonexistent'])
        assert os.path.exists(out_file)
        assert 'Aggregated' in capsys.readouterr().out


class TestAudioCLI:
    def test_timeit(self, tmp_path, capsys):
        from convasr_tpu.audio import write_audio
        from convasr_tpu.cli.audio import main
        path = str(tmp_path / 'x.wav')
        write_audio(path, np.zeros((1, 8000), np.float32), 8000)
        main(['timeit', '--audio-path', path, '--number', '3', '--number-warmup', '1',
              '--audio-backend', 'scipy'])
        assert 'scipy' in capsys.readouterr().out
