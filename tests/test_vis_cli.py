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


class TestVisGapFeatures:
    """Round-2 additions (VERDICT r1 #7): speaker barcodes, diarization HTML,
    audiosample, words, fmt_alignment."""

    def test_speaker_barcode_svg(self):
        from convasr_tpu.vis.report import fmt_svg_speaker_barcode
        tr = [dict(begin=0.0, end=1.0, speaker=1),
              dict(begin=1.0, end=2.5, speaker=2)]
        svg = fmt_svg_speaker_barcode(tr, 0.0, 2.5)
        assert '<svg' in svg and svg.count('<rect') == 2
        assert 'speaker1' in svg and 'speaker2' in svg
        # second rect starts at 1.0/2.5 = 0.4
        assert 'x="0.4000"' in svg

    def test_transcript_report_has_barcode(self, transcript_json, tmp_path):
        out = str(tmp_path / 'view.html')
        main(['transcript', transcript_json, '-o', out])
        assert '<svg' in open(out).read()

    def test_diarization_cli(self, tmp_path, capsys):
        data = [dict(audio_name='a', ser=0.1, der=0.2, der_=0.3,
                     ref=[dict(begin=0.0, end=1.0, speaker=1),
                          dict(begin=1.0, end=2.0, speaker=2)],
                     hyp=[dict(begin=0.0, end=2.0, speaker=1)])]
        path = str(tmp_path / 'diar.json')
        with open(path, 'w') as f:
            json.dump(data, f)
        out = str(tmp_path / 'diar.html')
        main(['diarization', path, '-o', out])
        html = open(out).read()
        assert html.count('<svg') == 2           # ref + hyp barcodes
        assert 'avg' in html and '0.10' in html  # ser column
        assert 'border-hyp' in html

    def test_audiosample_cli(self, tmp_path):
        sr = 8000
        wav = str(tmp_path / 's.wav')
        write_audio(wav, (0.1 * np.random.RandomState(1).randn(1, sr)).astype(np.float32), sr)
        data = [dict(audio_path=wav, ref='привет', group='g1'),
                dict(audio_path=str(tmp_path / 'missing.wav'), ref='мир', group='g2')]
        path = str(tmp_path / 'samples.json')
        with open(path, 'w') as f:
            json.dump(data, f, ensure_ascii=False)
        out = str(tmp_path / 'samples.html')
        main(['audiosample', path, '-o', out, '-K', '5'])
        html = open(out).read()
        assert '<h1>g1</h1>' in html and '<h1>g2</h1>' in html
        assert 'data:audio/wav;base64,' in html   # embedded player
        assert 'file not found' in html           # missing file row

    def test_words_cli(self, tmp_path, capsys):
        train = tmp_path / 'train.csv'
        val = tmp_path / 'val.csv'
        train.write_text('a.wav,привет мир\n' * 3)
        val.write_text('b.wav,привет редкое\n' + 'c.wav,редкое слово\n' * 2)
        main(['words', str(train), str(val)])
        out = capsys.readouterr().out
        assert 'редкое 3 0' in out     # frequent in val, absent in train
        assert '\nмир' not in out      # words with val count <= 1 filtered

    def test_fmt_alignment(self):
        from convasr_tpu.vis.report import fmt_alignment
        words = [dict(hyp='превет', ref='привет', error_tag='typo_easy'),
                 dict(hyp='', ref='мир', error_tag='missing')]
        html = fmt_alignment(words)
        assert 'background-color:lightgreen' in html  # typo_easy
        assert 'background-color:red' in html         # missing
        assert html.startswith('<pre>') and html.endswith('</pre>')
        assert 'ref: ' in html and 'hyp: ' in html
        only_hyp = fmt_alignment(words, hyp=True, prefix=False)
        assert 'ref' not in only_hyp.replace('"ref"', '')

    def test_errors_table_uses_alignment(self, tmp_path):
        data = [dict(audio_path='x.wav', ref='привет мир', hyp='превет',
                     cer=0.3, labels_name='char_legacy',
                     alignment=[dict(hyp='превет', ref='привет', error_tag='typo_easy'),
                                dict(hyp='', ref='мир', error_tag='missing')])]
        path = str(tmp_path / 'analyzed.json')
        with open(path, 'w') as f:
            json.dump(data, f, ensure_ascii=False)
        out = str(tmp_path / 'errors.html')
        main(['errors', path, '-o', out])
        html = open(out).read()
        assert 'background-color:lightgreen' in html
