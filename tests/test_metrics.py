"""Tests for cer/wer, Needleman alignment, and the error analyzer."""
import json
import pathlib
import random

import pytest

from convasr_tpu.metrics import (
    ErrorAnalyzer, ErrorTagger, Needleman, WordTagger, align_strings, align_words,
    cer, edit_distance, wer,
)


def brute_levenshtein(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        dp[i][0] = i
    for j in range(len(b) + 1):
        dp[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1, dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return dp[len(a)][len(b)]


class TestEditDistance:
    def test_against_bruteforce(self):
        rng = random.Random(0)
        for _ in range(50):
            a = ''.join(rng.choice('абв') for _ in range(rng.randint(0, 8)))
            b = ''.join(rng.choice('абв') for _ in range(rng.randint(0, 8)))
            assert edit_distance(a, b) == brute_levenshtein(a, b)

    def test_cer(self):
        assert cer(hyp='привет', ref='привет') == 0
        assert cer(hyp='пrивет', ref='привет') == pytest.approx(1 / 6)
        assert cer(hyp='при вет', ref='привет') == 0  # spaces stripped
        assert cer(hyp='абв', ref='') == 3  # ref len clamps to 1

    def test_wer(self):
        assert wer(hyp='привет мир', ref='привет мир') == 0
        assert wer(hyp='привет мир', ref='пока мир') == pytest.approx(0.5)
        assert wer(hyp='а б в', ref='а в') == pytest.approx(0.5)


class TestNeedleman:
    def test_identical(self):
        nw = Needleman()
        a, b = nw.align(list('абв'), list('абв'))
        assert a == list('абв') and b == list('абв')

    def test_gap_padding(self):
        nw = Needleman(score_null=5, score_sub=-3, score_del=-4, score_ins=-3)
        a, b = nw.align(list('абвг'), list('абг'))
        assert len(a) == len(b)
        assert ''.join(a).replace('|', '') == 'абвг'
        assert ''.join(b).replace('|', '') == 'абг'

    def test_word_level_gaps_match_word_length(self):
        nw = Needleman(score_null=100, score_sub=-6, score_del=-8, score_ins=-3)
        a, b = nw.align('привет большой мир'.split(), 'привет мир'.split())
        assert [w for w in b if '|' in w] == ['|' * len('большой')]

    def test_empty(self):
        nw = Needleman()
        a, b = nw.align([], list('аб'))
        assert a == ['|', '|'] and b == list('аб')

    def test_semi_global_free_end_gaps(self):
        nw = Needleman(score_null=5, score_sub=-3, score_del=-4, score_ins=-3)
        a, b = nw.align(list('абвгд'), list('вг'), semi_global=True)
        joined = ''.join(b)
        assert joined.replace('|', '') == 'вг'
        assert len(a) == len(b)

    def test_map_alignment(self):
        nw = Needleman()
        m = nw.map_alignment(list('аа|ббб'), list('аааббб'))
        # matches the reference code path (metrics.py:516-539): the inserted
        # position maps to the *current* index
        assert m == [0, 1, 2, 2, 3, 4]


class TestAlignStrings:
    def test_equal(self):
        h, r = align_strings(hyp='привет мир', ref='привет мир')
        assert h == r == 'привет мир'

    def test_sub(self):
        h, r = align_strings(hyp='превет мир', ref='привет мир')
        assert len(h) == len(r)
        assert r.replace('|', '') == 'привет мир'
        assert h.replace('|', '') == 'превет мир'

    def test_insert_delete(self):
        h, r = align_strings(hyp='мир', ref='привет мир')
        assert len(h) == len(r)
        assert r.replace('|', '').strip() == 'привет мир'


class TestAlignWords:
    def test_tags(self):
        h, r = align_strings(hyp='превет мир', ref='привет мир')
        words = align_words(h, r, compute_cer=True)
        assert [w['ref'] for w in words] == ['привет', 'мир']
        assert words[0]['error_tag'] in (ErrorTagger.typo_easy, ErrorTagger.typo_hard)
        assert words[1]['error_tag'] == ErrorTagger.ok
        assert words[1]['cer'] == 0

    def test_missing_word(self):
        h, r = align_strings(hyp='мир', ref='привет мир')
        words = align_words(h, r)
        tags = {w['ref']: w['error_tag'] for w in words}
        assert tags['привет'] == ErrorTagger.missing
        assert tags['мир'] == ErrorTagger.ok


class TestAlignWordsPostproc:
    def test_prefer_replacement_merges_ins_del(self):
        from convasr_tpu.metrics.analyzer import _prefer_replacement
        # adjacent insert+delete becomes a substitution
        hyp, ref = _prefer_replacement(hyp='аб|', ref='а|б')
        assert len(hyp) == len(ref)
        assert '|' not in hyp or '|' not in ref or len(hyp) < 3

    def test_align_words_postproc_path(self):
        h, r = align_strings(hyp='превет мир', ref='привет мир')
        words = align_words(h, r, postproc=True, compute_cer=True)
        assert [w['ref'] for w in words] == ['привет', 'мир']

class TestNeedlemanProportion:
    def test_proportion_mode_weights_by_length(self):
        from convasr_tpu.metrics.needleman import SCORE_PROPORTION
        nw = Needleman(score_null=2, score_sub=-1, score_del=-1, score_ins=-1,
                       mode=SCORE_PROPORTION)
        a, b = nw.align(['яяя', 'б'], ['яяя', 'в'], semi_global=False)
        # sub cost scales with element length: substituting the 1-char word
        # (-1) beats del+ins (-2); the 3-char match contributes +6
        assert a == ['яяя', 'б'] and b == ['яяя', 'в']


class TestSegmentByRef:
    def test_resegment_along_reference(self):
        from convasr_tpu.data import transcripts
        hyp = [dict(begin=0.1, end=0.4, hyp='а'), dict(begin=0.6, end=0.9, hyp='б'),
               dict(begin=1.1, end=1.4, hyp='в')]
        ref_segments = [[dict(begin=0.0, end=0.5)], [dict(begin=0.5, end=1.5)]]
        out = list(transcripts.segment_by_ref(hyp, ref_segments))
        assert len(out) == 2
        assert [t['hyp'] for t in out[0]] == ['а']
        assert [t['hyp'] for t in out[1]] == ['б', 'в']


class TestErrorTagger:
    def test_ok(self):
        assert ErrorTagger().tag(hyp='дом', ref='дом')[0] == ErrorTagger.ok

    def test_typo_easy_single_error(self):
        assert ErrorTagger().tag(hyp='дам', ref='дом')[0] == ErrorTagger.typo_easy

    def test_missing(self):
        assert ErrorTagger().tag(hyp='||||||', ref='привет')[0] == ErrorTagger.missing

    def test_missing_ref(self):
        assert ErrorTagger().tag(hyp='привет', ref='||||||')[0] == ErrorTagger.missing_ref

    def test_clamp(self):
        _, errors = ErrorTagger().tag(hyp='||||||', ref='привет', clamp=True)
        assert errors == -2


class TestWordTagger:
    def test_vocab(self):
        wt = WordTagger(vocab={'дом'})
        assert WordTagger.vocab_hit in wt.tag('дом')
        assert WordTagger.vocab_miss in wt.tag('кот')

    def test_stop_tag(self):
        wt = WordTagger(word_tags={'stop': ['ну', 'вот']})
        assert 'stop' in wt.tag('ну')


class TestErrorAnalyzer:
    def setup_method(self):
        root = pathlib.Path(__file__).resolve().parent.parent
        val_config = json.loads((root / 'configs' / 'ru_val_config.json').read_text())
        self.analyzer = ErrorAnalyzer(
            word_tagger=WordTagger(word_tags=val_config['word_tags']),
            configs=val_config['error_analyzer'])

    def test_analyze_basic(self):
        res = self.analyzer.analyze(hyp='превет мир', ref='привет мир')
        assert 0 < res['cer'] < 0.5
        assert res['wer'] == pytest.approx(0.5)

    def test_analyze_detailed(self):
        res = self.analyzer.analyze(hyp='превет мир', ref='привет мир', detailed=True)
        assert 'alignment' in res and 'char_stats' in res
        assert res['char_stats']['replace'] == 1
        assert 'default' in res
        assert res['default']['num_words'] == 2
        assert res['default']['wer_wordwise'] == pytest.approx(0.5)

    def test_aggregate(self):
        analyzed = [self.analyzer.analyze(hyp='превет мир', ref='привет мир', detailed=True),
                    self.analyzer.analyze(hyp='привет мир', ref='привет мир', detailed=True)]
        stats = self.analyzer.aggregate(analyzed)
        assert stats['cer'] == pytest.approx((analyzed[0]['cer'] + analyzed[1]['cer']) / 2)
        assert 'errors' in stats and 'distribution' in stats['errors']

    def test_filter_words_exclude_stop(self):
        res = self.analyzer.analyze(hyp='ну мир', ref='ну мир', detailed=True)
        assert res['words_without_stop']['num_words'] == 1
