"""Unit tests for the text layer (tokenizers, pipelines, normalization).

The expected strings encode the behavior of the reference implementations
(text_processing.py, text_tokenizers.py, ru.py) run mentally/by-spec; the
doubled-char repeat marker and её-folding cases mirror
configs/ru_text_config.json pipelines.
"""
import pathlib

import pytest

from convasr_tpu.text import (
    BPETokenizer, CharTokenizer, ProcessingPipeline, Stemmer, TextNormalizer,
    TextPostprocessor, TextPreprocessor, train_bpe,
)
from convasr_tpu.text.langs import ru

CONFIG = ProcessingPipeline.load_config(
    str(pathlib.Path(__file__).resolve().parent.parent / 'configs' / 'ru_text_config.json'))


class TestCharTokenizer:
    def setup_method(self):
        self.tok = CharTokenizer('абвгдеёжзийклмнопрстуфхцчшщъыьэюя')

    def test_vocab_layout(self):
        # 33 letters + unk + punkt + repeat + space + eps
        assert self.tok.vocab_size == 38
        assert self.tok.vocab[-1] == '|'
        assert self.tok.vocab[-2] == ' '
        assert self.tok.eps_id == 37 and self.tok.space_id == 36

    def test_roundtrip(self):
        [ids] = self.tok.encode(['привет мир'])
        assert self.tok.decode([ids]) == ['привет мир']

    def test_unk(self):
        [ids] = self.tok.encode(['приветz'])
        assert ids[-1] == self.tok.unk_idx

    def test_word_start(self):
        assert self.tok.is_start_word_token(self.tok.space_id)
        assert not self.tok.is_start_word_token(0)
        assert self.tok.silence_tokens_ids == {self.tok.eps_id, self.tok.space_id}


class TestNumbers:
    def test_roman(self):
        assert ru.ROMAN2ARABIC['XIX'] == 19
        assert ru.ROMAN2ARABIC['IV'] == 4
        assert ru.arabic2roman(19) == 'XIX'

    def test_cardinal(self):
        assert ru.arabic2text(0) == 'ноль'
        assert ru.arabic2text(21) == 'двадцать один'
        assert ru.arabic2text(100) == 'сто'
        assert ru.arabic2text(2638) == 'два тысяча шестьсот тридцать восемь'
        assert ru.arabic2text(-4) == 'минус четыре'

    def test_ordinal(self):
        assert ru.arabic2text(1, ordinal=True) == 'первый'
        assert ru.arabic2text(21, ordinal=True) == 'двадцать первый'

    def test_normalize_text(self):
        assert ru.normalize_text('XIX век') == 'девятнадцать век'
        assert ru.normalize_text('100%') == 'сто процент*'
        out = ru.normalize_text('1-й дом')
        assert out == 'первый дом'


class TestTextNormalizer:
    def test_superscripts_and_percent(self):
        tn = TextNormalizer()
        assert 'процент' in tn.normalize('50%')
        assert tn.normalize('10') == 'десять'

    def test_keeps_leading_space(self):
        tn = TextNormalizer()
        assert tn.normalize(' привет').startswith(' ')


class TestPipelines:
    def test_dataset_pipeline_repeat_encoding(self):
        p = ProcessingPipeline.make(CONFIG, 'dataset')
        # doubled letters become letter + '2' marker
        assert p.preprocess('аллея') == 'ал2ея'
        assert p.postprocess('ал2ея') == 'аллея'

    def test_char_legacy_collapse(self):
        p = ProcessingPipeline.make(CONFIG, 'char_legacy')
        # triple letters: repeat marker for first double, then collapse
        assert p.preprocess('дом') == 'дом'

    def test_postprocess_yo_folding(self):
        p = ProcessingPipeline.make(CONFIG, 'no_repeat')
        assert p.postprocess('ёлка') == 'елка'

    def test_encode_decode(self):
        p = ProcessingPipeline.make(CONFIG, 'char_legacy')
        [ids] = p.encode(['мир'])
        assert p.decode([ids]) == ['мир']

    def test_drop_substrings(self):
        p = ProcessingPipeline.make(CONFIG, 'char_legacy')
        assert p.preprocess('до|м*') == 'дом'

    def test_external_normalizes_numbers(self):
        p = ProcessingPipeline.make(CONFIG, 'external')
        assert p.preprocess('2 дома') == 'два дома'


class TestPrePostProcessor:
    def test_preprocessor_order_repeat_before_collapse(self):
        pre = TextPreprocessor(repeat_character='2', collapse_char_series=True,
                               allowed_chars='абвгдеёжзийклмнопрстуфхцчшщъыьэюя2 ')
        # 'лл' -> 'л2' (non-overlapping), then no adjacent repeats remain
        assert pre('саллли') == 'сал2ли'

    def test_postprocessor_repeat_decode_at_start(self):
        post = TextPostprocessor(repeat_character='2')
        assert post('2аб') == 'аб'


class TestStemmer:
    def test_lengths(self):
        s = Stemmer('ru')
        assert s('дом') == 'дом'
        assert s('привет') == 'прив'
        assert s('собеседник') == 'собесед'

    def test_inflections(self):
        stem, infl = ru.stem('красивый', inflections=ru.INFLECTIONS, inflection=True)
        assert stem + infl == 'красивый'
        assert len(stem) < len('красивый')


class TestBPE:
    CORPUS = ['привет мир', 'привет дом', 'мир дому', 'домик в лесу', 'привет лес'] * 10

    def test_train_and_roundtrip(self):
        model = train_bpe(self.CORPUS, vocab_size=64)
        tok = BPETokenizer(model)
        assert tok.vocab_size <= 64
        [ids] = tok.encode(['привет мир'])
        assert tok.decode([ids]) == ['привет мир']

    def test_word_start_tokens(self):
        model = train_bpe(self.CORPUS, vocab_size=64)
        tok = BPETokenizer(model)
        [ids] = tok.encode(['привет мир'])
        assert tok.is_start_word_token(ids[0])
        starts = [i for i, t in enumerate(ids) if tok.is_start_word_token(t)]
        assert len(starts) == 2  # two words

    def test_special_ids(self):
        model = train_bpe(self.CORPUS, vocab_size=64)
        tok = BPETokenizer(model)
        assert tok.pad_id in tok.silence_tokens_ids
        [ids] = tok.encode(['мир'], bos=True, eos=True)
        assert ids[0] == tok.bos_id and ids[-1] == tok.eos_id

    def test_unknown_char_maps_to_unk(self):
        model = train_bpe(self.CORPUS, vocab_size=64)
        tok = BPETokenizer(model)
        [ids] = tok.encode(['xyz'])
        # first symbol is the bare word-start marker piece; the rest are unk
        assert all(i == tok.unk_id for i in ids[1:]) and len(ids) == 4
