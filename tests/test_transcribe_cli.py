"""End-to-end transcribe CLI smoke test: checkpoint -> wav -> transcript files."""
import json
import os
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope='module')
def checkpoint_and_audio(tmp_path_factory):
    from convasr_tpu.audio import write_audio
    from convasr_tpu.frontend.logmel import LogFilterBankFrontend
    from convasr_tpu.models.zoo import create_model
    from convasr_tpu.train.checkpoints import save_checkpoint
    from convasr_tpu.train.loop import TrainState

    tmp = tmp_path_factory.mktemp('transcribe')
    sr = 8000
    frontend = LogFilterBankFrontend(out_channels=16, sample_rate=sr,
                                     window_size=0.02, window_stride=0.01, dither=0.0)
    model = create_model('JasperNetSmall', num_input_features=16, num_classes=(38,),
                         frontend=frontend, base_width=8)
    x0 = jnp.zeros((1, sr), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, xlen=jnp.ones((1,), jnp.float32))
    state = TrainState(step=jnp.zeros([], jnp.int32), params=variables['params'],
                       batch_stats=variables.get('batch_stats', {}), opt_state={})
    ckpt_path = str(tmp / 'ckpt')
    args = dict(model='JasperNetSmall', sample_rate=sr, window_size=0.02,
                window_stride=0.01, window='hann_window', num_input_features=16,
                text_config=str(ROOT / 'configs' / 'ru_text_config.json'),
                text_pipelines=['char_legacy'], base_width=8)
    save_checkpoint(ckpt_path, state, epoch=0, args=args)

    wav_path = str(tmp / 'utt.wav')
    rng = np.random.RandomState(0)
    write_audio(wav_path, (0.1 * rng.randn(1, sr * 1)).astype(np.float32), sr)
    ref_json = str(tmp / 'utt.wav.json')
    with open(ref_json, 'w') as f:
        json.dump([dict(audio_path=wav_path, ref='привет мир', begin=0.0, end=1.0)], f,
                  ensure_ascii=False)
    return ckpt_path, wav_path, str(tmp)


def run_cli(checkpoint_and_audio, extra_args=()):
    from convasr_tpu.cli.transcribe import build_parser, main
    ckpt_path, wav_path, tmp = checkpoint_and_audio
    out_dir = os.path.join(tmp, 'out')
    argv = ['--checkpoint', ckpt_path, '-i', wav_path, '-o', out_dir,
            '--output-json', '--output-txt', '--output-csv', '--mono',
            '--bf16', 'false'] + list(extra_args)
    args = build_parser().parse_args(argv)
    main(args)
    return out_dir, wav_path


class TestTranscribeCLI:
    def test_outputs_created(self, checkpoint_and_audio):
        out_dir, wav_path = run_cli(checkpoint_and_audio)
        name = os.path.basename(wav_path)
        json_out = os.path.join(out_dir, name + '.json')
        txt_out = os.path.join(out_dir, name + '.txt')
        csv_out = os.path.join(out_dir, 'transcripts.csv')
        assert os.path.exists(json_out) and os.path.exists(txt_out) and os.path.exists(csv_out)
        segments = json.load(open(json_out))
        assert isinstance(segments, list)
        for t in segments:
            assert 'hyp' in t and 'cer' in t

    def test_align_flag(self, checkpoint_and_audio):
        out_dir, wav_path = run_cli(checkpoint_and_audio, ['--align', '--align-words'])
        name = os.path.basename(wav_path)
        segments = json.load(open(os.path.join(out_dir, name + '.json')))
        assert isinstance(segments, list)

    def test_checkpoint_args_override_cli(self, checkpoint_and_audio):
        from convasr_tpu.cli.transcribe import build_parser, setup
        ckpt_path, wav_path, tmp = checkpoint_and_audio
        args = build_parser().parse_args([
            '--checkpoint', ckpt_path, '-i', wav_path, '--output-json',
            '--sample-rate', '16000', '--num-input-features', '64', '--bf16', 'false'])
        setup(args)
        # hyper-params come FROM the checkpoint (spec: transcribe.py:26)
        assert args.sample_rate == 8000
        assert args.num_input_features == 16

    def test_none_hyperparams_in_checkpoint_args_use_zoo_defaults(
            self, checkpoint_and_audio, tmp_path):
        """Checkpoints trained without explicit --base-width/--dropout record
        None in args; setup must fall back to the zoo defaults instead of
        overriding the model with None (regression: base_width=None from a
        smoke-trained checkpoint crashed serve/transcribe/benchmark)."""
        import shutil
        from convasr_tpu.cli.transcribe import build_parser, setup
        ckpt_path, wav_path, tmp = checkpoint_and_audio
        ckpt2 = str(tmp_path / 'ckpt_none')
        shutil.copytree(ckpt_path, ckpt2)
        meta_path = os.path.join(ckpt2, 'meta.json')
        meta = json.load(open(meta_path))
        meta['args']['base_width'] = None
        meta['args']['dropout'] = None
        json.dump(meta, open(meta_path, 'w'))
        args = build_parser().parse_args([
            '--checkpoint', ckpt2, '-i', wav_path, '--output-json',
            '--bf16', 'false'])
        _, _, model, forward, _, _ = setup(args)
        # zoo default for JasperNetSmall would differ from the saved width-8
        # weights; the None must simply be ignored, not applied
        assert model.base_width is not None


class TestDataParallelTranscribe:
    def test_sharded_equals_single_device(self, checkpoint_and_audio, tmp_path):
        """--data-parallel (VERDICT r3 #2): transcription sharded over the
        8-device CPU mesh must produce byte-identical transcripts to the
        single-device run — incl. a batch NOT divisible by the axis size
        (5 utterances over 8 devices exercises the zero-pad rows).

        Spec: /root/reference/transcribe.py:63-300 — the product CLI must
        scale like the train loop (models.py:736-752 DataParallel)."""
        from convasr_tpu.audio import write_audio
        from convasr_tpu.cli.transcribe import build_parser, main
        ckpt_path, _, _ = checkpoint_and_audio
        sr, rng = 8000, np.random.RandomState(7)
        entries = []
        for i in range(5):
            wav = str(tmp_path / f'u{i}.wav')
            dur = sr // 2 + i * sr // 4  # distinct lengths -> real xlen mix
            write_audio(wav, (0.1 * rng.randn(1, dur)).astype(np.float32), sr)
            entries.append(dict(audio_path=wav, ref='привет мир',
                                begin=0.0, end=dur / sr))
        manifest = str(tmp_path / 'batch.json')
        json.dump(entries, open(manifest, 'w'), ensure_ascii=False)

        def run(extra):
            out = str(tmp_path / ('out_dp' if extra else 'out_1'))
            args = build_parser().parse_args(
                ['--checkpoint', ckpt_path, '-i', manifest, '-o', out,
                 '--output-json', '--mono', '--bf16', 'false'] + extra)
            main(args)
            return sorted(
                (t['audio_path'], t['hyp'])
                for f in os.listdir(out) if f.endswith('.json')
                for t in json.load(open(os.path.join(out, f))))

        single = run([])
        sharded = run(['--data-parallel'])
        assert len(single) == 5 and sharded == single, (single, sharded)


class TestDiarizeFlag:
    def test_mono_segments_get_speaker_attribution(self, checkpoint_and_audio,
                                                   tmp_path):
        """--diarize (VERDICT r3 #5): mono audio's output segments carry
        speaker ids from diarize_mono clustering; --speakers names them.
        Spec: /root/reference/transcribe.py:208-222."""
        import importlib.util
        import pathlib
        spec_d = importlib.util.spec_from_file_location(
            'diar_fixture', pathlib.Path(__file__).parent / 'test_diarization_mono.py')
        diar = importlib.util.module_from_spec(spec_d)
        spec_d.loader.exec_module(diar)

        from convasr_tpu.audio import write_audio
        from convasr_tpu.cli.transcribe import build_parser, main
        ckpt_path, _, _ = checkpoint_and_audio
        rng = np.random.RandomState(11)
        sig, ref = diar.make_mixture(rng, turns=6)
        wav = str(tmp_path / 'dialog.wav')
        write_audio(wav, sig[None], diar.SR)
        # per-turn manifest entries -> one output segment per speaker turn
        manifest = str(tmp_path / 'dialog.json')
        json.dump([dict(audio_path=wav, ref='', begin=t['begin'],
                        end=t['end']) for t in ref], open(manifest, 'w'))
        out = str(tmp_path / 'out')
        args = build_parser().parse_args(
            ['--checkpoint', ckpt_path, '-i', manifest, '-o', out,
             '--output-json', '--mono', '--bf16', 'false', '--diarize',
             '--speakers', 'alice', 'bob'])
        main(args)
        segs = json.load(open(os.path.join(out, 'dialog.wav.json')))
        assert len(segs) == len(ref)
        speakers = {t['speaker'] for t in segs}
        assert speakers <= {0, 1, 2} and {1, 2} <= speakers, segs
        # the turn structure alternates; the labels must track it (up to the
        # cluster-id permutation)
        labels = [t['speaker'] for t in segs]
        truth = [t['speaker'] for t in ref]
        agree = max(sum(a == b for a, b in zip(labels, truth)),
                    sum(a == 3 - b for a, b in zip(labels, truth)))
        assert agree >= len(ref) - 1, (labels, truth)
        names = {t['speaker_name'] for t in segs if t['speaker'] > 0}
        assert names <= {'alice', 'bob'} and names, names


class TestDualHeadTranscribe:
    """Dual-head (char+BPE) checkpoints through the transcribe CLI.

    The reference ships BPE as a production mode with dual char+BPE heads
    (models.py:27-35, JasperNetBigBpeOnly models.py:1422); a user must be
    able to point transcribe at such a checkpoint and pick the head with
    --pipeline. Before the fix, setup() built a single-head model and the
    dual-head param tree did not fit."""

    @pytest.fixture(scope='class')
    def dual_checkpoint(self, tmp_path_factory):
        from convasr_tpu.audio import write_audio
        from convasr_tpu.frontend.logmel import LogFilterBankFrontend
        from convasr_tpu.models.zoo import create_model
        from convasr_tpu.text import train_bpe
        from convasr_tpu.train.checkpoints import save_checkpoint
        from convasr_tpu.train.loop import TrainState

        tmp = tmp_path_factory.mktemp('dual_head')
        sr = 8000
        bpe_model = str(tmp / 'bpe.json')
        train_bpe(['привет мир', 'мир привет'], vocab_size=16,
                  model_path=bpe_model)
        config = json.load(open(ROOT / 'configs' / 'ru_text_config.json'))
        config['tokenizers']['bpe'] = dict(model_path=bpe_model,
                                           **{'class': 'BPETokenizer'})
        config['pipelines']['bpe'] = dict(
            tokenizer='bpe', preprocessor='default', postprocessor='default')
        text_config = str(tmp / 'text_config.json')
        json.dump(config, open(text_config, 'w'), ensure_ascii=False)

        from convasr_tpu.text import ProcessingPipeline
        pipes = [ProcessingPipeline.make(config, n)
                 for n in ('char_legacy', 'bpe')]
        frontend = LogFilterBankFrontend(out_channels=16, sample_rate=sr,
                                         window_size=0.02, window_stride=0.01,
                                         dither=0.0)
        model = create_model(
            'JasperNetSmall', num_input_features=16,
            num_classes=tuple(p.tokenizer.vocab_size for p in pipes),
            decoder_type='bpe', frontend=frontend, base_width=8)
        x0 = jnp.zeros((1, sr), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0,
                               xlen=jnp.ones((1,), jnp.float32))
        state = TrainState(step=jnp.zeros([], jnp.int32),
                           params=variables['params'],
                           batch_stats=variables.get('batch_stats', {}),
                           opt_state={})
        ckpt_path = str(tmp / 'ckpt')
        save_checkpoint(ckpt_path, state, epoch=0, args=dict(
            model='JasperNetSmall', sample_rate=sr, window_size=0.02,
            window_stride=0.01, window='hann_window', num_input_features=16,
            text_config=text_config, text_pipelines=['char_legacy', 'bpe'],
            base_width=8))
        wav_path = str(tmp / 'utt.wav')
        rng = np.random.RandomState(0)
        write_audio(wav_path, (0.1 * rng.randn(1, sr)).astype(np.float32), sr)
        return ckpt_path, wav_path, str(tmp)

    def _run(self, dual_checkpoint, out_name, extra=()):
        from convasr_tpu.cli.transcribe import build_parser, main
        ckpt_path, wav_path, tmp = dual_checkpoint
        out_dir = os.path.join(tmp, out_name)
        args = build_parser().parse_args(
            ['--checkpoint', ckpt_path, '-i', wav_path, '-o', out_dir,
             '--output-json', '--mono', '--bf16', 'false'] + list(extra))
        main(args)
        return json.load(open(os.path.join(
            out_dir, os.path.basename(wav_path) + '.json')))

    def test_default_head_is_first(self, dual_checkpoint):
        segs = self._run(dual_checkpoint, 'out_char')
        assert isinstance(segs, list)

    def test_bpe_head_selected(self, dual_checkpoint):
        segs = self._run(dual_checkpoint, 'out_bpe', ['--pipeline', 'bpe'])
        assert isinstance(segs, list)

    def test_unknown_pipeline_fails_loudly(self, dual_checkpoint):
        with pytest.raises(AssertionError, match='nope'):
            self._run(dual_checkpoint, 'out_bad', ['--pipeline', 'nope'])
