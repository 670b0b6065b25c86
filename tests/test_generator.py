"""GreedyCTCGenerator semantics (spec: transcript_generators.py:8-93)."""
import numpy as np
import pytest

from convasr_tpu.decode.generators import GreedyCTCGenerator
from convasr_tpu.text import CharTokenizer

TOK = CharTokenizer('аб')
A, B_, SPACE, EPS = (TOK.char2idx['а'], TOK.char2idx['б'], TOK.space_id, TOK.eps_id)


def run(ids, blank_amount_to_space=3, with_ts=True):
    T = len(ids)
    gen = GreedyCTCGenerator(blank_amount_to_space=blank_amount_to_space)
    ts = np.linspace(0, 1, T)[None, :] if with_ts else None
    out = gen.generate(tokenizer=TOK, log_probs=None, begin=np.zeros(1),
                       end=np.ones(1), output_lengths=[T], time_stamps=ts,
                       most_probable_idx=np.asarray([ids]))
    return out[0][0]


class TestGreedyGenerator:
    def test_basic_collapse(self):
        segments = run([A, A, EPS, B_, B_])
        assert ' '.join(s['hyp'] for s in segments).replace(' ', '') == 'аб'

    def test_repeat_across_blank_survives(self):
        segments = run([A, EPS, A])
        text = ''.join(s['hyp'] for s in segments)
        assert text.count('а') == 2

    def test_blank_run_inserts_space(self):
        segments = run([A] + [EPS] * 5 + [B_], blank_amount_to_space=3)
        # a long blank run inserts a space CHARACTER into the running segment
        # (segments split only on EMITTED space tokens, spec:
        # transcript_generators.py:59-68)
        assert len(segments) == 1
        assert segments[0]['hyp'] == 'а б'

    def test_emitted_space_splits_segments(self):
        segments = run([A, SPACE, B_])
        assert len(segments) == 2

    def test_short_blank_run_no_space(self):
        segments = run([A, EPS, EPS, B_], blank_amount_to_space=10)
        assert len(segments) == 1
        assert segments[0]['hyp'].replace(' ', '') == 'аб'

    def test_all_silence(self):
        segments = run([EPS, EPS, SPACE, EPS])
        assert segments == []

    def test_timestamps_monotonic(self):
        segments = run([A, A, EPS] * 4 + [EPS] * 5 + [B_, B_], blank_amount_to_space=3)
        for s in segments:
            assert 0.0 <= s['begin'] <= s['end'] <= 1.0
        for s1, s2 in zip(segments, segments[1:]):
            assert s1['begin'] <= s2['begin']

    def test_output_lengths_truncate(self):
        gen = GreedyCTCGenerator()
        out = gen.generate(tokenizer=TOK, log_probs=None, begin=np.zeros(1),
                           end=np.ones(1), output_lengths=[2], time_stamps=None,
                           most_probable_idx=np.asarray([[A, A, B_, B_]]))
        # only the first 2 frames decoded
        assert ''.join(s['hyp'] for s in out[0][0]).replace(' ', '') == 'а'

    def test_segment_extra_info(self):
        gen = GreedyCTCGenerator()
        out = gen.generate(tokenizer=TOK, log_probs=None, begin=np.zeros(1),
                           end=np.ones(1), output_lengths=[3],
                           time_stamps=np.linspace(0, 1, 3)[None, :],
                           most_probable_idx=np.asarray([[A, B_, A]]),
                           segment_extra_info=[dict(speaker=7)])
        assert all(s['speaker'] == 7 for s in out[0][0])

    def test_argmax_from_log_probs(self):
        lp = np.full((1, 3, TOK.vocab_size), -10.0, np.float32)
        lp[0, 0, A] = 0.0
        lp[0, 1, EPS] = 0.0
        lp[0, 2, B_] = 0.0
        gen = GreedyCTCGenerator()
        out = gen.generate(tokenizer=TOK, log_probs=lp, begin=np.zeros(1),
                           end=np.ones(1), output_lengths=[3], time_stamps=None)
        assert ''.join(s['hyp'] for s in out[0][0]).replace(' ', '') == 'аб'
