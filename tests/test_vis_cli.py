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


class TestVisFlagParity:
    """Round-2 flag parity with reference vis.py:808-872 subcommand options."""

    def _two_runs(self, tmp_path):
        def entry(ap, cer, wer, dur):
            return dict(audio_path=ap, ref='привет', hyp='превет',
                        cer=cer, wer=wer, duration=dur, labels_name='char_legacy')
        run_a = [entry('a.wav', 0.10, 0.5, 1.0), entry('b.wav', 0.50, 1.0, 9.0)]
        run_b = [entry('a.wav', 0.20, 0.5, 1.0), entry('b.wav', 0.40, 1.0, 9.0)]
        pa, pb = str(tmp_path / 'runA.json'), str(tmp_path / 'runB.json')
        json.dump(run_a, open(pa, 'w'), ensure_ascii=False)
        json.dump(run_b, open(pb, 'w'), ensure_ascii=False)
        return pa, pb

    def test_errors_metric_filters(self, tmp_path):
        pa, pb = self._two_runs(tmp_path)
        out = str(tmp_path / 'filtered.html')
        # keep only examples with 0 <= 100*cer < 30 in EVERY run -> a.wav only
        main(['errors', pa, pb, '-o', out, '--metrics', 'cer', 'wer',
              '--metric-filters', 'cer', '0', '30'])
        html = open(out).read()
        assert 'a.wav' not in html or True  # table has no path col; check counts
        assert html.count('<tr>') == 2      # header + 1 surviving row
        assert 'Dropped' in html and '1 (filters)' in html

    def test_errors_exclude_and_duration(self, tmp_path):
        pa, pb = self._two_runs(tmp_path)
        out = str(tmp_path / 'dur.html')
        main(['errors', pa, pb, '-o', out, '--duration', '0-5'])
        assert open(out).read().count('<tr>') == 2   # b.wav (9 s) dropped

    def test_errors_sort_key(self, tmp_path):
        pa, pb = self._two_runs(tmp_path)
        out = str(tmp_path / 'sorted.html')
        main(['errors', pa, pb, '-o', out, '--sort-key', 'cer', '--descending',
              '--metrics', 'cer'])
        html = open(out).read()
        # descending by run-A cer: b.wav (0.50) row before a.wav (0.10)
        assert html.find('50.00%') < html.find('10.00%')

    def test_tabulate_show_ratio_below_and_json(self, tmp_path, capsys):
        exp = tmp_path / 'exp' / 'run'
        os.makedirs(exp)
        with open(exp / 'transcripts_val_epoch00_iter0000100.json', 'w') as f:
            json.dump([dict(cer=0.1, labels_name='char_legacy'),
                       dict(cer=0.4, labels_name='char_legacy')], f)
        main(['tabulate', '--experiments-dir', str(tmp_path / 'exp'),
              '--experiment-id', 'run', '--show-ratio-below', '0.2', '--json'])
        out = json.loads(capsys.readouterr().out)
        (vals,) = out.values()
        assert vals['val'] == 0.5

    def test_label_paged(self, transcript_json, tmp_path, capsys):
        info = [dict(audio_name='a.wav', before='превет')] * 3
        info_path = str(tmp_path / 'info.json')
        json.dump(info, open(info_path, 'w'), ensure_ascii=False)
        base = str(tmp_path / 'lab')
        main(['label', transcript_json, '-o', base, '--info', info_path,
              '--page-size', '2', '--prefix', 'exp'])
        assert os.path.exists(base + '.page0.html')
        assert os.path.exists(base + '.page1.html')
        html = open(base + '.page0.html').read()
        assert 'page 0/2' in html and 'exp_page0_time' in html
