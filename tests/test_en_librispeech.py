"""English language module + LibriSpeech builder tests."""
import json
import os

import pytest

from convasr_tpu.text import ProcessingPipeline
from convasr_tpu.text.langs import en


class TestEnglishNumbers:
    def test_cardinals(self):
        assert en.arabic2text(0) == 'zero'
        assert en.arabic2text(21) == 'twenty one'
        assert en.arabic2text(105) == 'one hundred five'
        assert en.arabic2text(1900) == 'one thousand nine hundred'
        assert en.arabic2text(-4) == 'minus four'

    def test_ordinals(self):
        assert en.arabic2text(1, ordinal=True) == 'first'
        assert en.arabic2text(3, ordinal=True) == 'third'
        assert en.arabic2text(20, ordinal=True) == 'twentieth'
        assert en.arabic2text(21, ordinal=True) == 'twenty first'

    def test_normalize(self):
        assert en.normalize_text('Chapter 3') == 'chapter three'
        assert en.normalize_text("don't stop") == "don't stop"
        assert en.normalize_text('the 2nd day') == 'the second day'

    def test_stem(self):
        assert en.stem('walking') == 'walk'
        assert en.stem('cat') == 'cat'


class TestEnPipeline:
    def test_roundtrip(self):
        config = ProcessingPipeline.load_config('configs/en_text_config.json')
        p = ProcessingPipeline.make(config, 'char_en')
        text = p.preprocess("hello world don't")
        [ids] = p.encode([text])
        assert p.decode([ids]) == ["hello world don't"]
        assert p.tokenizer.vocab_size == 27 + 5  # alphabet + specials


class TestLibriSpeechBuilder:
    def test_build(self, tmp_path):
        from convasr_tpu.tools.librispeech import build
        d = tmp_path / '19' / '198'
        os.makedirs(d)
        (d / '19-198.trans.txt').write_text(
            '19-198-0000 HELLO WORLD\n19-198-0001 GOOD DAY\n')
        for utt in ['19-198-0000', '19-198-0001']:
            (d / f'{utt}.flac').write_bytes(b'')
        out = str(tmp_path / 'test.json')
        entries = build(str(tmp_path), out)
        assert len(entries) == 2
        assert entries[0]['ref'] == 'hello world'
        assert json.load(open(out)) == entries
