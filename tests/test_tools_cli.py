"""Tools CLI tests for the main dataset-manipulation subcommands."""
import json
import os

import numpy as np
import pytest

from convasr_tpu.audio import write_audio
from convasr_tpu.cli.tools import main as tools_main


@pytest.fixture
def corpus(tmp_path):
    sr = 8000
    rng = np.random.RandomState(0)
    entries = []
    for i in range(3):
        path = str(tmp_path / f'a{i}.wav')
        write_audio(path, (0.1 * rng.randn(1, sr)).astype(np.float32), sr)
        entries.append(dict(audio_path=path, ref=f'привет {i}', begin=0.2, end=0.8,
                            cer=0.1 * i, channel=0, speaker=1))
    json_path = str(tmp_path / 'data.json')
    with open(json_path, 'w') as f:
        json.dump(entries, f, ensure_ascii=False)
    return tmp_path, json_path, sr


class TestToolsCLI:
    def test_du(self, corpus, capsys):
        _, json_path, _ = corpus
        tools_main(['du', '-i', json_path])
        assert 'utt' in capsys.readouterr().out

    def test_cat(self, corpus, tmp_path):
        _, json_path, _ = corpus
        out = str(tmp_path / 'cat.json')
        tools_main(['cat', '-i', json_path, json_path, '-o', out])
        assert len(json.load(open(out))) == 6

    def test_cut(self, corpus, tmp_path):
        _, json_path, sr = corpus
        out_dir = str(tmp_path / 'cutout')
        tools_main(['cut', '-i', json_path, '-o', out_dir, '--sample-rate', str(sr), '--mono'])
        cut_json = os.path.join(out_dir, os.path.basename(out_dir) + '.json')
        cut_transcript = json.load(open(cut_json))
        assert len(cut_transcript) == 3
        for t in cut_transcript:
            assert os.path.exists(t['audio_path'])
            assert t['end'] == pytest.approx(0.6, abs=0.01)

    def test_subset_by_cer(self, corpus, tmp_path):
        base, json_path, _ = corpus
        in_dir = str(tmp_path / 'subin')
        os.makedirs(in_dir)
        os.rename(json_path, os.path.join(in_dir, 'data.json'))
        out = str(tmp_path / 'subset.json')
        tools_main(['subset', '-i', in_dir, '-o', out, '--cer', '0-0.15'])
        assert len(json.load(open(out))) == 2

    def test_csv2json(self, corpus, tmp_path):
        _, json_path, _ = corpus
        csv_path = str(tmp_path / 'data.csv')
        with open(csv_path, 'w') as f:
            f.write('a.wav,привет,0.0,1.0\nb.wav,мир,0.5,2.0\n')
        tools_main(['csv2json', '-i', csv_path])
        out = json.load(open(csv_path + '.json'))
        assert len(out) == 2 and out[0]['begin'] == 0.0

    def test_csv2json_short_long_debug(self, tmp_path):
        """Debug switches (spec: tools.py:167-229): begin/end from the file
        name, audio_path re-pointed under --new-sub-path, refs blanked."""
        name = '198.38-200.38_2.0_0_1582594487.376404.wav'
        csv_path = str(tmp_path / 'd.csv')
        with open(csv_path, 'w') as f:
            f.write(f'short_records/{name},привет,0.0,1.0\n')
        out_path = str(tmp_path / 'out.csv')
        tools_main(['csv2json', '-i', csv_path,
                    '--debug-short-long-records-set-begin-end-from-name',
                    '--debug-short-long-records-reset-audio-path',
                    '--debug-short-long-records-clean-out-ref',
                    '--new-sub-path', 'short_records/sub',
                    '--debug-short-long-records-output-path', out_path])
        [t] = json.load(open(out_path + '.json'))
        assert t['begin'] == 198.38 and t['end'] == 200.38
        assert t['ref'] == ''
        assert t['old_audio_path'].startswith('short_records/')
        assert t['audio_path'] == 'long_records/sub/0_1582594487.376404.wav'

    def test_bpetrain(self, tmp_path):
        text_path = str(tmp_path / 'text.txt')
        with open(text_path, 'w') as f:
            f.write('привет мир\n' * 20 + 'привет дом\n' * 10)
        tools_main(['bpetrain', '-i', text_path, '-o', str(tmp_path / 'bpe'),
                    '--vocab-size', '40'])
        from convasr_tpu.text import BPETokenizer
        tok = BPETokenizer(str(tmp_path / 'bpe.json'))
        [ids] = tok.encode(['привет мир'])
        assert tok.decode([ids]) == ['привет мир']

    def test_filter_dataset(self, corpus, tmp_path):
        _, json_path, _ = corpus
        out = str(tmp_path / 'filtered.json')
        tools_main(['filter_dataset', '-i', json_path, '-o', out, '--cer', '0.15'])
        assert all(t['cer'] <= 0.15 for t in json.load(open(out)))

    def test_split(self, corpus, tmp_path):
        _, json_path, _ = corpus
        out_dir = str(tmp_path / 'splitout')
        os.makedirs(out_dir)
        tools_main(['split', '-i', json_path, '-o', out_dir,
                    '--val-duration-in-hours', '0.0001'])
        names = os.listdir(out_dir)
        assert any('val' in n for n in names) and any('train' in n for n in names)

    def test_cleanup_empty_ref(self, tmp_path):
        json_path = str(tmp_path / 'd.json')
        with open(json_path, 'w') as f:
            json.dump([dict(ref='привет'), dict(ref='')], f, ensure_ascii=False)
        tools_main(['cleanup_transcripts_with_empty_ref', '-i', json_path,
                    '--min-ref-length', '1'])
        out = json.load(open(json_path + '_cleaned.json'))
        assert len(out) == 1

    def test_shape_solver(self, capsys):
        tools_main(['find_solution_for_frontend_input_output_shapes_divisibility',
                    '--start', '1', '--end', '2', '--sample-rate', '8000'])
        assert 'Finished!' in capsys.readouterr().out

    def test_rmoldcheckpoints(self, tmp_path, capsys):
        exp = tmp_path / 'exp' / 'run1'
        os.makedirs(exp)
        for e, i in [(0, 10), (0, 20), (1, 30), (1, 40)]:
            os.makedirs(exp / f'checkpoint_epoch{e:02d}_iter{i:07d}')
        tools_main(['rmoldcheckpoints', '--experiments-dir', str(tmp_path / 'exp'),
                    '--experiment-id', 'run1', '--keepfirstperepoch', '--remove'])
        remaining = sorted(os.listdir(exp))
        # keeps first overall, first per epoch, and all of the last epoch
        assert 'checkpoint_epoch00_iter0000010' in remaining
        assert 'checkpoint_epoch00_iter0000020' not in remaining
