"""Offline benchmark CLI smoke tests (spec: /root/reference/benchmark.py —
synthetic batch, warmup, timed loop, RTF print). Tiny shapes on CPU; asserts
each decode branch runs end to end and prints an RTF line."""
import pytest


def _run(capsys, extra):
    from convasr_tpu.cli.benchmark import build_parser, main
    args = build_parser().parse_args([
        '--device', 'cpu', '--model', 'JasperNetSmall',
        '--num-input-features', '16', '--base-width', '8',
        '--bf16', 'false', '-B', '2', '-T', '1',
        '--iterations', '2', '--warmup-iterations', '1'] + extra)
    main(args)
    out = capsys.readouterr().out
    assert 'RTF:' in out
    return out


class TestBenchmarkCLI:
    def test_forward(self, capsys):
        out = _run(capsys, [])
        assert 'fwd:' in out

    def test_host_beam(self, capsys):
        out = _run(capsys, ['--decoder', 'BeamSearchDecoder',
                            '--beam-width', '4', '--beam-cutoff-top-n', '4'])
        assert 'fwd+beam' in out and 'host beam decode' in out

    def test_hybrid_device_beam(self, capsys):
        out = _run(capsys, ['--decoder', 'BeamSearchDecoderDeviceLM',
                            '--beam-width', '4', '--beam-cutoff-top-n', '4'])
        assert 'fwd+devbeam' in out and 'host word-LM rescore' in out

    def test_hybrid_with_lm(self, capsys, tmp_path):
        arpa = tmp_path / 'word.arpa'
        arpa.write_text('\\data\\\nngram 1=3\n\n\\1-grams:\n-1.0\t<unk>\n'
                        '-0.5\tмир\n-0.9\tпривет\n\n\\end\\\n')
        out = _run(capsys, ['--decoder', 'BeamSearchDecoderDeviceLM',
                            '--beam-width', '4', '--beam-cutoff-top-n', '4',
                            '--lm', str(arpa)])
        assert 'fwd+devbeam+lm' in out

    def test_backward(self, capsys):
        out = _run(capsys, ['--backward'])
        assert 'fwd+bwd' in out
