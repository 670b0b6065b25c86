"""Transcribe CLI with --join-transcript (batched_channels, stereo calls)."""
import json
import os
import pathlib

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


class TestJoinTranscript:
    def test_stereo_channels_mode(self, tmp_path):
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
        ckpt = str(tmp_path / 'ckpt')
        save_checkpoint(ckpt, TrainState(step=jnp.zeros([], jnp.int32),
                                         params=variables['params'],
                                         batch_stats=variables.get('batch_stats', {}),
                                         opt_state={}),
                        args=dict(model='JasperNetSmall', sample_rate=sr,
                                  window_size=0.02, window_stride=0.01,
                                  window='hann_window', num_input_features=16,
                                  base_width=8,
                                  text_config=str(ROOT / 'configs' / 'ru_text_config.json'),
                                  text_pipelines=['char_legacy']))

        rng = np.random.RandomState(0)
        wav = str(tmp_path / 'call.wav')
        write_audio(wav, (0.1 * rng.randn(2, sr)).astype(np.float32), sr)
        entries = [dict(audio_path=wav, ref='привет', begin=0.0, end=0.5,
                        channel=0, speaker=1),
                   dict(audio_path=wav, ref='мир', begin=0.5, end=1.0,
                        channel=1, speaker=2)]
        seg_json = str(tmp_path / 'call.wav.json')
        with open(seg_json, 'w') as f:
            json.dump(entries, f, ensure_ascii=False)

        out_dir = str(tmp_path / 'out')
        args = build_parser().parse_args([
            '--checkpoint', ckpt, '-i', seg_json, '-o', out_dir, '--output-json',
            '--join-transcript', '--bf16', 'false'])
        main(args)
        outputs = [f for f in os.listdir(out_dir) if f.endswith('.json')]
        assert outputs
        segments = json.load(open(os.path.join(out_dir, outputs[0])))
        assert isinstance(segments, list) and segments
