"""Transcribe CLI with the BeamSearchDecoder option."""
import json
import os
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


class TestTranscribeBeam:
    def test_beam_decoder_flag(self, tmp_path):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from convasr_tpu.audio import write_audio
        from convasr_tpu.cli.transcribe import build_parser, main
        from convasr_tpu.frontend.logmel import LogFilterBankFrontend
        from convasr_tpu.models.zoo import create_model
        from convasr_tpu.train.checkpoints import save_checkpoint
        from convasr_tpu.train.loop import TrainState

        sr = 8000
        frontend = LogFilterBankFrontend(out_channels=16, sample_rate=sr,
                                         window_size=0.02, window_stride=0.01, dither=0.0)
        model = create_model('JasperNetSmall', num_input_features=16, num_classes=(38,),
                             frontend=frontend, base_width=8)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, sr), jnp.float32),
                               xlen=jnp.ones((1,), jnp.float32))
        state = TrainState(step=jnp.zeros([], jnp.int32), params=variables['params'],
                           batch_stats=variables.get('batch_stats', {}), opt_state={})
        ckpt = str(tmp_path / 'ckpt')
        save_checkpoint(ckpt, state, args=dict(
            model='JasperNetSmall', sample_rate=sr, window_size=0.02, window_stride=0.01,
            window='hann_window', num_input_features=16, base_width=8,
            text_config=str(ROOT / 'configs' / 'ru_text_config.json'),
            text_pipelines=['char_legacy']))

        wav = str(tmp_path / 'u.wav')
        rng = np.random.RandomState(0)
        write_audio(wav, (0.1 * rng.randn(1, sr)).astype(np.float32), sr)

        out_dir = str(tmp_path / 'out')
        args = build_parser().parse_args([
            '--checkpoint', ckpt, '-i', wav, '-o', out_dir, '--output-json', '--mono',
            '--bf16', 'false', '--decoder', 'BeamSearchDecoder', '--beam-width', '8'])
        main(args)
        name = os.path.basename(wav)
        segments = json.load(open(os.path.join(out_dir, name + '.json')))
        assert isinstance(segments, list)
        for t in segments:
            assert 'hyp' in t

        # on-device beam variant
        out_dir2 = str(tmp_path / 'out_device')
        args = build_parser().parse_args([
            '--checkpoint', ckpt, '-i', wav, '-o', out_dir2, '--output-json', '--mono',
            '--bf16', 'false', '--decoder', 'BeamSearchDecoderDevice',
            '--beam-width', '8'])
        main(args)
        segments2 = json.load(open(os.path.join(out_dir2, name + '.json')))
        assert isinstance(segments2, list)

        # hybrid: device beam top-K + host word-LM rescoring
        arpa = str(tmp_path / 'word.arpa')
        with open(arpa, 'w') as f:
            f.write('\\data\\\nngram 1=3\n\n\\1-grams:\n-1.0\t<unk>\n'
                    '-0.5\tмир\n-0.9\tпривет\n\n\\end\\\n')
        out_dir3 = str(tmp_path / 'out_hybrid')
        args = build_parser().parse_args([
            '--checkpoint', ckpt, '-i', wav, '-o', out_dir3, '--output-json', '--mono',
            '--bf16', 'false', '--decoder', 'BeamSearchDecoderDeviceLM',
            '--beam-width', '8', '--lm', arpa])
        main(args)
        segments3 = json.load(open(os.path.join(out_dir3, name + '.json')))
        assert isinstance(segments3, list)
        for t in segments3:
            assert 'hyp' in t
