"""Wav2vec (v1) frontend tests: torch-oracle parity with synthetic weights,
fairseq-layout converter roundtrip, JasperNet integration, train CLI run.

The torch oracle below implements the fairseq wav2vec v1 formulas
independently (conv -> GroupNorm(1) -> ReLU, log compression; aggregator with
left replication pad, residual skips scaled by sqrt(residual_scale)) — the
executable spec the reference loads via Wav2VecModel.build_model
(models.py:446-483).
"""
import json
import math
import pathlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from convasr_tpu.frontend.wav2vec import (
    Wav2VecAggregator, Wav2VecFeatureExtractor, Wav2VecFrontend,
    convert_fairseq_checkpoint,
)

ROOT = pathlib.Path(__file__).resolve().parent.parent

FEAT_LAYERS = ((8, 4, 2), (8, 3, 2))
AGG_LAYERS = ((8, 3, 1), (12, 3, 1), (12, 2, 1))  # dim change + even kernel


def torch_extractor(x, sd, layers):
    h = x.unsqueeze(1)  # (B, 1, T)
    for i, (dim, k, s) in enumerate(layers):
        w = sd[f'feature_extractor.conv_layers.{i}.0.weight']
        h = torch.nn.functional.conv1d(h, w, stride=s)
        h = torch.nn.functional.group_norm(
            h, 1, sd[f'feature_extractor.conv_layers.{i}.2.weight'],
            sd[f'feature_extractor.conv_layers.{i}.2.bias'])
        h = torch.relu(h)
    return torch.log1p(h.abs())


def torch_aggregator(h, sd, layers, residual_scale=0.5):
    scale = math.sqrt(residual_scale)
    for i, (dim, k, s) in enumerate(layers):
        residual = h
        ka, kb = k // 2, (k // 2 - 1 if k % 2 == 0 else k // 2)
        p = torch.nn.functional.pad(h, (ka + kb, 0), mode='replicate')
        p = torch.nn.functional.conv1d(p, sd[f'feature_aggregator.conv_layers.{i}.1.weight'],
                                       stride=s)
        p = torch.nn.functional.group_norm(
            p, 1, sd[f'feature_aggregator.conv_layers.{i}.3.weight'],
            sd[f'feature_aggregator.conv_layers.{i}.3.bias'])
        p = torch.relu(p)
        rp = sd.get(f'feature_aggregator.residual_proj.{i}.weight')
        if rp is not None:
            residual = torch.nn.functional.conv1d(residual, rp)
        h = (p + residual) * scale
    return h


def synth_fairseq_sd(rng, feat_layers, agg_layers):
    sd = {}
    in_ch = 1
    for i, (dim, k, s) in enumerate(feat_layers):
        sd[f'feature_extractor.conv_layers.{i}.0.weight'] = torch.as_tensor(
            (0.3 * rng.randn(dim, in_ch, k)).astype(np.float32))
        sd[f'feature_extractor.conv_layers.{i}.2.weight'] = torch.as_tensor(
            (1 + 0.1 * rng.randn(dim)).astype(np.float32))
        sd[f'feature_extractor.conv_layers.{i}.2.bias'] = torch.as_tensor(
            (0.1 * rng.randn(dim)).astype(np.float32))
        in_ch = dim
    for i, (dim, k, s) in enumerate(agg_layers):
        sd[f'feature_aggregator.conv_layers.{i}.1.weight'] = torch.as_tensor(
            (0.3 * rng.randn(dim, in_ch, k)).astype(np.float32))
        sd[f'feature_aggregator.conv_layers.{i}.3.weight'] = torch.as_tensor(
            (1 + 0.1 * rng.randn(dim)).astype(np.float32))
        sd[f'feature_aggregator.conv_layers.{i}.3.bias'] = torch.as_tensor(
            (0.1 * rng.randn(dim)).astype(np.float32))
        if in_ch != dim:
            sd[f'feature_aggregator.residual_proj.{i}.weight'] = torch.as_tensor(
                (0.3 * rng.randn(dim, in_ch, 1)).astype(np.float32))
        in_ch = dim
    return sd


class TestParityVsTorchOracle:
    def test_extractor_and_aggregator_match(self):
        rng = np.random.RandomState(0)
        sd = synth_fairseq_sd(rng, FEAT_LAYERS, AGG_LAYERS)
        x = (0.2 * rng.randn(3, 64)).astype(np.float32)

        fe = Wav2VecFrontend(out_channels=AGG_LAYERS[-1][0], sample_rate=8000,
                             feature_layers=FEAT_LAYERS, aggregator_layers=AGG_LAYERS)
        params = convert_fairseq_checkpoint({k: v.numpy() for k, v in sd.items()},
                                            feature_layers=FEAT_LAYERS,
                                            aggregator_layers=AGG_LAYERS)
        ours = np.asarray(fe.apply({'params': params}, jnp.asarray(x)))

        with torch.no_grad():
            raw = torch_extractor(torch.as_tensor(x), sd, FEAT_LAYERS)
            ref = torch_aggregator(raw, sd, AGG_LAYERS).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_extractor_only(self):
        rng = np.random.RandomState(1)
        sd = synth_fairseq_sd(rng, FEAT_LAYERS, ())
        x = (0.2 * rng.randn(2, 50)).astype(np.float32)
        fe = Wav2VecFrontend(out_channels=FEAT_LAYERS[-1][0], sample_rate=8000,
                             feature_layers=FEAT_LAYERS, aggregator_layers=(),
                             use_context_features=False)
        params = convert_fairseq_checkpoint({k: v.numpy() for k, v in sd.items()},
                                            feature_layers=FEAT_LAYERS,
                                            aggregator_layers=())
        ours = np.asarray(fe.apply({'params': params}, jnp.asarray(x)))
        with torch.no_grad():
            ref = torch_extractor(torch.as_tensor(x), sd, FEAT_LAYERS).numpy()
        np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), rtol=1e-3, atol=1e-4)


class TestConverter:
    def test_pt_file_roundtrip(self, tmp_path):
        rng = np.random.RandomState(2)
        sd = synth_fairseq_sd(rng, FEAT_LAYERS, AGG_LAYERS)
        pt = str(tmp_path / 'w2v.pt')
        torch.save(dict(model=sd, args=None), pt)
        params = convert_fairseq_checkpoint(pt, feature_layers=FEAT_LAYERS,
                                            aggregator_layers=AGG_LAYERS)
        assert set(params) == {'feature_extractor', 'feature_aggregator'}
        assert 'residual_proj1' in params['feature_aggregator']  # 8 -> 12 proj
        k = params['feature_extractor']['conv0']['kernel']
        assert k.shape == (4, 1, 8)  # (k, in, out)

    def test_missing_keys_error(self):
        with pytest.raises(KeyError):
            convert_fairseq_checkpoint({}, feature_layers=FEAT_LAYERS)


class TestJasperIntegration:
    def test_frontend_as_submodule(self):
        """wav2vec params live under variables['params']['frontend'] and the
        full model trains one step."""
        from convasr_tpu.models.jasper import JasperNet
        from convasr_tpu.train.loop import (
            init_train_state, make_optimizer_with_accum, make_train_step)
        from convasr_tpu.train.optim import make_optimizer

        fe = Wav2VecFrontend(out_channels=12, sample_rate=8000,
                             feature_layers=FEAT_LAYERS, aggregator_layers=AGG_LAYERS)
        model = JasperNet(num_input_features=12, num_classes=(6,), repeat=1,
                          num_subblocks=1, residual='dense', kernel_sizes=(3,),
                          kernel_size_prologue=3, kernel_size_epilogue=3, base_width=4,
                          out_width_factors=(2,), out_width_factors_large=(3, 3),
                          dropout=0.0, temporal_mask=False, stride1=1,
                          frontend=fe)
        rng = np.random.RandomState(3)
        batch = dict(x=jnp.asarray((0.2 * rng.randn(2, 256)).astype(np.float32)),
                     xlen=jnp.asarray([1.0, 0.75], jnp.float32),
                     y=jnp.asarray(rng.randint(0, 5, (2, 1, 4)).astype(np.int32)),
                     ylen=jnp.asarray([[4], [3]], jnp.int32))
        optimizer = make_optimizer_with_accum(make_optimizer('sgd', lambda s: 1e-3))
        state = init_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
        assert 'frontend' in state.params
        assert 'feature_aggregator' in state.params['frontend']
        step = jax.jit(make_train_step(model, optimizer))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics['loss']))
        # frontend params actually received gradient updates
        before = np.asarray(state.params['frontend']['feature_extractor']['conv0']['kernel'])
        after = np.asarray(new_state.params['frontend']['feature_extractor']['conv0']['kernel'])
        assert not np.array_equal(before, after)

    def test_freeze_frontend_mask(self):
        from convasr_tpu.train.loop import freeze_mask
        params = {'frontend': {'feature_extractor': {'conv0': {'kernel': np.zeros(1)}}},
                  'block0': {'conv0': {'conv': {'kernel': np.zeros(1)}}}}
        mask = freeze_mask(params, freeze_frontend=True)
        assert mask['frontend']['feature_extractor']['conv0']['kernel'] is False
        assert mask['block0']['conv0']['conv']['kernel'] is True


class TestTrainCLI:
    def test_frontend_checkpoint_end_to_end(self, tmp_path, monkeypatch):
        """--frontend Wav2VecFrontend --frontend-checkpoint trains a step and
        the converted weights actually land in the state."""
        from convasr_tpu.audio import write_audio
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.frontend import wav2vec as w2v_mod

        # shrink the default architecture for CPU speed (dataclass defaults
        # are baked into __init__, so patch the constructor with a partial)
        import functools
        small_fe = functools.partial(w2v_mod.Wav2VecFrontend,
                                     feature_layers=FEAT_LAYERS,
                                     aggregator_layers=AGG_LAYERS)
        monkeypatch.setattr(w2v_mod, 'Wav2VecFrontend', small_fe)

        sr = 8000
        rng = np.random.RandomState(4)
        entries = []
        for i in range(4):
            path = str(tmp_path / f'u{i}.wav')
            write_audio(path, (0.1 * rng.randn(1, sr // 2)).astype(np.float32), sr)
            entries.append(dict(audio_path=path, ref=['привет', 'мир'][i % 2],
                                begin=0.0, end=0.5))
        train_json = str(tmp_path / 'train.json')
        with open(train_json, 'w') as f:
            json.dump(entries, f, ensure_ascii=False)

        sd = synth_fairseq_sd(rng, FEAT_LAYERS, AGG_LAYERS)
        w2v_pt = str(tmp_path / 'w2v.pt')
        torch.save(dict(model=sd, args=None), w2v_pt)

        from convasr_tpu.models import zoo
        orig = zoo.create_model
        def small(name, **kw):
            kw.update(base_width=4, repeat=1, num_subblocks=1, kernel_sizes=(3,),
                      kernel_size_prologue=3, kernel_size_epilogue=3,
                      out_width_factors=(2,), out_width_factors_large=(3, 3))
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small)
        monkeypatch.setattr(train_cli, 'create_model', small)

        args = train_cli.build_parser().parse_args([
            '--model', 'JasperNetSmall', '--num-input-features', str(AGG_LAYERS[-1][0]),
            '--frontend', 'Wav2VecFrontend', '--frontend-checkpoint', w2v_pt,
            '--train-data-path', train_json,
            '--experiments-dir', str(tmp_path / 'exp'), '--experiment-id', 'w2v',
            '--train-batch-size', '2', '--iterations', '1',
            '--log-iteration-interval', '1', '--val-iteration-interval', '0',
            '--epochs', '1', '--bf16', 'false', '--optimizer', 'SGD', '--lr', '1e-3',
            '--dropout', '0', '--num-workers', '0', '--checkpoint-skip',
            '--freeze-frontend',
            '--batch-time-padding-multiple', '128',
            '--text-config', str(ROOT / 'configs' / 'ru_text_config.json'),
            '--val-config', str(ROOT / 'configs' / 'ru_val_config.json')])
        train_cli.main(args)
        log = (tmp_path / 'exp' / 'w2v' / 'log.txt').read_text()
        assert 'loaded wav2vec frontend weights' in log
        assert 'iter 1' in log

    def test_transcribe_resumes_wav2vec_checkpoint(self, tmp_path, monkeypatch):
        """A checkpoint trained with --frontend Wav2VecFrontend transcribes
        through the transcribe CLI: the frontend choice is read back from the
        checkpoint args and its weights from params['frontend']."""
        import functools
        from convasr_tpu.audio import write_audio
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.cli import transcribe as transcribe_cli
        from convasr_tpu.frontend import wav2vec as w2v_mod
        from convasr_tpu.models import zoo

        small_fe = functools.partial(w2v_mod.Wav2VecFrontend,
                                     feature_layers=FEAT_LAYERS,
                                     aggregator_layers=AGG_LAYERS)
        monkeypatch.setattr(w2v_mod, 'Wav2VecFrontend', small_fe)

        orig = zoo.create_model
        def small(name, **kw):
            kw.update(base_width=4, repeat=1, num_subblocks=1, kernel_sizes=(3,),
                      kernel_size_prologue=3, kernel_size_epilogue=3,
                      out_width_factors=(2,), out_width_factors_large=(3, 3))
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small)
        monkeypatch.setattr(train_cli, 'create_model', small)
        monkeypatch.setattr(transcribe_cli, 'create_model', small)

        sr = 8000
        rng = np.random.RandomState(6)
        entries = []
        for i in range(4):
            path = str(tmp_path / f'u{i}.wav')
            write_audio(path, (0.1 * rng.randn(1, sr // 2)).astype(np.float32), sr)
            entries.append(dict(audio_path=path, ref=['привет', 'мир'][i % 2],
                                begin=0.0, end=0.5))
        train_json = str(tmp_path / 'train.json')
        with open(train_json, 'w') as f:
            json.dump(entries, f, ensure_ascii=False)

        args = train_cli.build_parser().parse_args([
            '--model', 'JasperNetSmall', '--num-input-features', str(AGG_LAYERS[-1][0]),
            '--frontend', 'Wav2VecFrontend',
            '--train-data-path', train_json,
            '--experiments-dir', str(tmp_path / 'exp'), '--experiment-id', 'w2v',
            '--train-batch-size', '2', '--iterations', '1',
            '--log-iteration-interval', '1', '--val-iteration-interval', '1',
            '--epochs', '1', '--bf16', 'false', '--optimizer', 'SGD', '--lr', '1e-3',
            '--dropout', '0', '--num-workers', '0',
            '--batch-time-padding-multiple', '128',
            '--text-config', str(ROOT / 'configs' / 'ru_text_config.json'),
            '--val-config', str(ROOT / 'configs' / 'ru_val_config.json')])
        train_cli.main(args)
        ckpts = sorted((tmp_path / 'exp' / 'w2v').glob('checkpoint_epoch*_iter*'))
        assert ckpts

        out_dir = tmp_path / 'out'
        targs = transcribe_cli.build_parser().parse_args([
            '--checkpoint', str(ckpts[-1]), '-i', train_json, '-o', str(out_dir),
            '--output-json', '--bf16', 'false', '--num-workers', '0',
            '--text-config', str(ROOT / 'configs' / 'ru_text_config.json')])
        transcribe_cli.main(targs)
        out_files = list(out_dir.glob('*.json'))
        assert out_files, 'transcribe produced no output for the wav2vec model'


class TestWav2VecSPMD:
    def test_sharded_step_matches_single_device(self):
        """wav2vec frontend under the data mesh: GSPMD-sharded train step
        computes the same loss as single-device (frontend params replicate,
        GroupNorm is per-sample so sharding-safe)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as Pt
        from convasr_tpu.models.jasper import JasperNet
        from convasr_tpu.parallel.mesh import make_mesh
        from convasr_tpu.train.loop import (
            init_train_state, make_optimizer_with_accum, make_train_step)
        from convasr_tpu.train.optim import make_optimizer

        assert len(jax.devices()) >= 8
        fe = Wav2VecFrontend(out_channels=12, sample_rate=8000,
                             feature_layers=FEAT_LAYERS, aggregator_layers=AGG_LAYERS)
        model = JasperNet(num_input_features=12, num_classes=(6,), repeat=1,
                          num_subblocks=1, residual='dense', kernel_sizes=(3,),
                          kernel_size_prologue=3, kernel_size_epilogue=3, base_width=4,
                          dropout=0.0, temporal_mask=False, stride1=1,
                          out_width_factors=(2,), out_width_factors_large=(3, 3),
                          frontend=fe)
        rng = np.random.RandomState(7)
        batch = dict(x=jnp.asarray((0.2 * rng.randn(8, 256)).astype(np.float32)),
                     xlen=jnp.ones((8,), jnp.float32),
                     y=jnp.asarray(rng.randint(0, 5, (8, 1, 4)).astype(np.int32)),
                     ylen=jnp.full((8, 1), 4, jnp.int32))
        optimizer = make_optimizer_with_accum(make_optimizer('sgd', lambda s: 1e-3))
        state = init_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
        step = make_train_step(model, optimizer)

        _, m_single = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

        mesh = make_mesh(n_data=8)
        repl, shard = NamedSharding(mesh, Pt()), NamedSharding(mesh, Pt('data'))
        state_r = jax.device_put(state, repl)
        batch_r = jax.tree.map(lambda a: jax.device_put(a, shard), batch)
        sharded = jax.jit(step, in_shardings=(repl, shard, repl),
                          out_shardings=(repl, repl))
        _, m_mesh = sharded(state_r, batch_r, jax.device_put(jax.random.PRNGKey(1), repl))
        np.testing.assert_allclose(float(m_mesh['loss']), float(m_single['loss']),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m_mesh['grad_norm']),
                                   float(m_single['grad_norm']), rtol=1e-4)
