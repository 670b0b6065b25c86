"""Train CLI smoke test: a few iterations on synthetic wavs + eval-only mode."""
import json
import os
import pathlib

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    from convasr_tpu.audio import write_audio
    tmp = tmp_path_factory.mktemp('traincli')
    sr = 8000
    rng = np.random.RandomState(0)
    entries = []
    for i in range(8):
        path = str(tmp / f'u{i}.wav')
        dur = 0.5 + 0.25 * (i % 2)
        write_audio(path, (0.1 * rng.randn(1, int(sr * dur))).astype(np.float32), sr)
        entries.append(dict(audio_path=path, ref=['привет', 'мир'][i % 2],
                            begin=0.0, end=dur))
    train_json = str(tmp / 'train.json')
    val_json = str(tmp / 'val.json')
    with open(train_json, 'w') as f:
        json.dump(entries, f, ensure_ascii=False)
    with open(val_json, 'w') as f:
        json.dump(entries[:4], f, ensure_ascii=False)
    return tmp, train_json, val_json


def make_args(tmp, train_json, val_json, **overrides):
    from convasr_tpu.cli.train import build_parser
    argv = [
        '--model', 'JasperNetSmall', '--num-input-features', '16',
        '--train-data-path', train_json, '--val-data-path', val_json,
        '--experiments-dir', str(tmp / 'exp'), '--experiment-id', 'smoke',
        '--train-batch-size', '4', '--val-batch-size', '4',
        '--iterations', '3', '--log-iteration-interval', '1',
        '--val-iteration-interval', '3', '--epochs', '2',
        '--bf16', 'false', '--optimizer', 'SGD', '--lr', '1e-3',
        '--batch-time-padding-multiple', '128',
        '--text-config', str(ROOT / 'configs' / 'ru_text_config.json'),
        '--val-config', str(ROOT / 'configs' / 'ru_val_config.json'),
    ]
    args = build_parser().parse_args(argv)
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


class TestTrainCLI:
    def test_smoke_train(self, corpus, monkeypatch):
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.models import zoo
        # shrink the model for CPU speed
        orig = zoo.create_model

        def small_create(name, **kw):
            kw.setdefault('base_width', 8)
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small_create)
        monkeypatch.setattr(train_cli, 'create_model', small_create)

        tmp, train_json, val_json = corpus
        args = make_args(tmp, train_json, val_json)
        train_cli.main(args)

        exp_dir = os.path.join(str(tmp / 'exp'), 'smoke')
        log_json = os.path.join(exp_dir, 'log.json')
        assert os.path.exists(log_json)
        lines = [json.loads(l) for l in open(log_json)]
        assert len(lines) >= 3
        assert all(np.isfinite(l['loss']) for l in lines)
        # checkpoint written at the val interval
        ckpts = [d for d in os.listdir(exp_dir) if d.startswith('checkpoint_')]
        assert ckpts, os.listdir(exp_dir)

    def test_eval_only_with_checkpoint(self, corpus, monkeypatch):
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.models import zoo
        orig = zoo.create_model

        def small_create(name, **kw):
            kw.setdefault('base_width', 8)
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small_create)
        monkeypatch.setattr(train_cli, 'create_model', small_create)

        tmp, train_json, val_json = corpus
        exp_dir = os.path.join(str(tmp / 'exp'), 'smoke')
        ckpts = sorted(d for d in os.listdir(exp_dir) if d.startswith('checkpoint_'))
        args = make_args(tmp, train_json, val_json,
                         train_data_path=[],
                         checkpoint=os.path.join(exp_dir, ckpts[-1]))
        train_cli.main(args)  # should run eval and return without error

    def test_steps_per_dispatch_matches_single(self, corpus, monkeypatch, tmp_path):
        """--steps-per-dispatch K scans K steps in one jit: the training
        trajectory (per-step losses) must match K=1 exactly."""
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.models import zoo
        orig = zoo.create_model

        def small_create(name, **kw):
            kw.setdefault('base_width', 8)
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small_create)
        monkeypatch.setattr(train_cli, 'create_model', small_create)

        tmp, train_json, val_json = corpus
        losses = {}
        for K in (1, 3):
            args = make_args(tmp, train_json, val_json,
                             experiments_dir=str(tmp_path / f'exp{K}'),
                             iterations=4, val_iteration_interval=0,
                             checkpoint_skip=True, dropout=0.0,
                             steps_per_dispatch=K, num_workers=0)
            train_cli.main(args)
            log = os.path.join(str(tmp_path / f'exp{K}'), 'smoke', 'log.json')
            losses[K] = [json.loads(l)['loss'] for l in open(log)]
        assert len(losses[3]) == len(losses[1]) == 4
        np.testing.assert_allclose(losses[3], losses[1], rtol=1e-5, atol=1e-6)


    def test_device_cache_matches_streaming(self, corpus, monkeypatch, tmp_path):
        """--device-cache (corpus resident in HBM, steps gather by row index)
        must reproduce the streaming trajectory EXACTLY: same sampler
        schedule, same int16-quantized audio, same keys -> same losses.
        Also exercises the cached multi-step scan (--steps-per-dispatch)."""
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.models import zoo
        orig = zoo.create_model

        def small_create(name, **kw):
            kw.setdefault('base_width', 8)
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small_create)
        monkeypatch.setattr(train_cli, 'create_model', small_create)

        tmp, train_json, val_json = corpus
        losses = {}
        for mode, cached, spd in [('stream', False, 1), ('cache', True, 1),
                                  ('cache_k2', True, 2)]:
            args = make_args(tmp, train_json, val_json,
                             experiments_dir=str(tmp_path / f'exp_{mode}'),
                             iterations=4, val_iteration_interval=0,
                             checkpoint_skip=True, dropout=0.0,
                             device_cache=cached, steps_per_dispatch=spd,
                             num_workers=0)
            train_cli.main(args)
            log = os.path.join(str(tmp_path / f'exp_{mode}'), 'smoke', 'log.json')
            losses[mode] = [json.loads(l)['loss'] for l in open(log)]
        assert len(losses['cache']) == len(losses['stream']) == 4
        np.testing.assert_allclose(losses['cache'], losses['stream'],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(losses['cache_k2'], losses['stream'],
                                   rtol=1e-5, atol=1e-6)

    def test_device_cache_sharded_layout_matches_streaming(
            self, corpus, monkeypatch, tmp_path):
        """--device-cache-layout sharded (rows sharded over the data axis,
        shard_map all_gather/psum batch assembly — device_cache.py
        make_sharded_gather) must reproduce the streaming trajectory exactly,
        incl. under the multi-step scan (VERDICT r2 #4)."""
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.models import zoo
        orig = zoo.create_model

        def small_create(name, **kw):
            kw.setdefault('base_width', 8)
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small_create)
        monkeypatch.setattr(train_cli, 'create_model', small_create)

        tmp, train_json, val_json = corpus
        losses = {}
        for mode, cached, layout, spd in [
                ('stream', False, 'auto', 1),
                ('shard', True, 'sharded', 1),
                ('shard_k2', True, 'sharded', 2)]:
            args = make_args(tmp, train_json, val_json,
                             experiments_dir=str(tmp_path / f'exp_{mode}'),
                             iterations=4, val_iteration_interval=0,
                             checkpoint_skip=True, dropout=0.0,
                             device_cache=cached, device_cache_layout=layout,
                             steps_per_dispatch=spd, num_workers=0)
            train_cli.main(args)
            log = os.path.join(str(tmp_path / f'exp_{mode}'), 'smoke', 'log.json')
            losses[mode] = [json.loads(l)['loss'] for l in open(log)]
        assert len(losses['shard']) == len(losses['stream']) == 4
        np.testing.assert_allclose(losses['shard'], losses['stream'],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(losses['shard_k2'], losses['stream'],
                                   rtol=1e-5, atol=1e-6)


class TestValDecoderAndLogits:
    """Round-2 flag parity: --decoder/--logits/--csv-columns actually work at
    validation (the reference parses but never wires them, train.py:553,975)."""

    def _small(self, monkeypatch):
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.models import zoo
        orig = zoo.create_model

        def small_create(name, **kw):
            kw.setdefault('base_width', 8)
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small_create)
        monkeypatch.setattr(train_cli, 'create_model', small_create)
        return train_cli

    def test_eval_device_beam_logits_csv(self, corpus, monkeypatch, tmp_path):
        train_cli = self._small(monkeypatch)
        tmp, train_json, val_json = corpus
        exp_dir = os.path.join(str(tmp / 'exp'), 'smoke')
        ckpts = sorted(d for d in os.listdir(exp_dir) if d.startswith('checkpoint_'))
        logits_path = str(tmp_path / 'logits_{val_dataset_name}.npz')
        args = make_args(tmp, train_json, val_json,
                         train_data_path=[],
                         checkpoint=os.path.join(exp_dir, ckpts[-1]),
                         decoder='BeamSearchDecoderDevice', beam_width=4,
                         beam_cutoff_top_n=8, beam_alpha=0.0, beam_beta=0.0,
                         logits=logits_path, logits_topk=3,
                         output_csv=True, csv_columns=['audio_name', 'hyp', 'cer'],
                         csv_sep=';')
        train_cli.main(args)
        # logits dumped, sparsified to top-3 classes
        lp = logits_path.format(val_dataset_name='val.json')
        data = np.load(lp, allow_pickle=True)
        assert any(k.endswith('_values') for k in data.files)
        (vkey,) = [k for k in data.files if k == 'logits_0_values']
        assert data[vkey].shape[-1] == 3
        # csv written with the custom header/sep, named by the decoder template
        exp = os.path.join(str(tmp / 'exp'), 'smoke')
        csvs = [f for f in os.listdir(exp) if f.endswith('.csv')
                and 'transcripts_' in f]
        assert csvs
        head = open(os.path.join(exp, sorted(csvs)[-1])).readline().strip()
        assert head == 'audio_name;hyp;cer'

    def test_eval_host_beam_oracle_topk(self, corpus, monkeypatch):
        train_cli = self._small(monkeypatch)
        tmp, train_json, val_json = corpus
        exp_dir = os.path.join(str(tmp / 'exp'), 'smoke')
        ckpts = sorted(d for d in os.listdir(exp_dir) if d.startswith('checkpoint_'))
        args = make_args(tmp, train_json, val_json,
                         train_data_path=[],
                         checkpoint=os.path.join(exp_dir, ckpts[-1]),
                         decoder='BeamSearchDecoder', beam_width=4,
                         decoder_topk=3)
        train_cli.main(args)  # oracle top-k path runs end to end


class TestDeviceCacheMultiBucket:
    def test_multi_bucket_cache_matches_streaming(self, monkeypatch, tmp_path):
        """Mixed durations spanning SEVERAL buckets: the cache groups rows
        per bucket (one compiled shape each), the sampler keeps batches
        within one bucket, and the trajectory must still equal streaming."""
        import numpy as np
        from convasr_tpu.audio import write_audio
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.models import zoo
        orig = zoo.create_model

        def small_create(name, **kw):
            kw.setdefault('base_width', 8)
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small_create)
        monkeypatch.setattr(train_cli, 'create_model', small_create)

        sr = 8000
        rng = np.random.RandomState(0)
        entries = []
        # 0.5 s -> bucket 1, 1.6 s -> bucket 2 (frame_count_bucket_fn 0.01/128)
        for i in range(8):
            dur = 0.5 if i % 2 == 0 else 1.6
            path = str(tmp_path / f'u{i}.wav')
            write_audio(path, (0.1 * rng.randn(1, int(sr * dur))).astype(np.float32), sr)
            entries.append(dict(audio_path=path, ref=['привет', 'мир'][i % 2],
                                begin=0.0, end=dur))
        train_json = str(tmp_path / 'train.json')
        with open(train_json, 'w') as f:
            json.dump(entries, f, ensure_ascii=False)

        losses = {}
        for mode, cached in [('stream', False), ('cache', True)]:
            args = make_args(tmp_path, train_json, train_json,
                             experiments_dir=str(tmp_path / f'exp_{mode}'),
                             iterations=4, val_iteration_interval=0,
                             checkpoint_skip=True, dropout=0.0,
                             device_cache=cached, steps_per_dispatch=2,
                             num_workers=0)
            train_cli.main(args)
            log = os.path.join(str(tmp_path / f'exp_{mode}'), 'smoke', 'log.json')
            losses[mode] = [json.loads(l)['loss'] for l in open(log)]
        assert len(losses['cache']) == len(losses['stream']) == 4
        np.testing.assert_allclose(losses['cache'], losses['stream'],
                                   rtol=1e-5, atol=1e-6)


class TestDeviceCacheResume:
    def test_resume_into_device_cache_continues_trajectory(
            self, corpus, monkeypatch, tmp_path):
        """checkpoint at iter 2 (streaming) -> resume with --device-cache:
        iters 3-4 must match an uninterrupted streaming run (sampler
        batch_idx accounting is feed-mode-independent)."""
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.models import zoo
        orig = zoo.create_model

        def small_create(name, **kw):
            kw.setdefault('base_width', 8)
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small_create)
        monkeypatch.setattr(train_cli, 'create_model', small_create)

        tmp, train_json, val_json = corpus

        # uninterrupted streaming baseline, 4 iters
        args = make_args(tmp, train_json, val_json,
                         experiments_dir=str(tmp_path / 'base'),
                         iterations=4, val_iteration_interval=0,
                         checkpoint_skip=True, dropout=0.0, num_workers=0)
        train_cli.main(args)
        base = [json.loads(l)['loss']
                for l in open(tmp_path / 'base' / 'smoke' / 'log.json')]

        # 2 iters streaming with a checkpoint
        args = make_args(tmp, train_json, val_json,
                         experiments_dir=str(tmp_path / 'part'),
                         iterations=2, val_iteration_interval=2,
                         dropout=0.0, num_workers=0)
        args.checkpoint_skip = False
        train_cli.main(args)
        ckpts = sorted((tmp_path / 'part' / 'smoke').glob('checkpoint_epoch*_iter*'))
        assert ckpts

        # resume with --device-cache for iters 3-4
        args = make_args(tmp, train_json, val_json,
                         experiments_dir=str(tmp_path / 'part'),
                         iterations=4, val_iteration_interval=0,
                         checkpoint_skip=True, dropout=0.0, num_workers=0,
                         device_cache=True)
        args.checkpoint = str(ckpts[-1])
        train_cli.main(args)
        resumed = [json.loads(l)
                   for l in open(tmp_path / 'part' / 'smoke' / 'log.json')]
        tail = [l['loss'] for l in resumed if l['iteration'] > 2]
        assert [l['iteration'] for l in resumed if l['iteration'] > 2] == [3, 4]
        np.testing.assert_allclose(tail, base[2:4], rtol=1e-5, atol=1e-6)


class TestRbgResume:
    def test_resume_under_rbg_warns_and_stays_sane(
            self, corpus, monkeypatch, tmp_path, caplog):
        """--prng rbg resume contract (VERDICT r2 #7): rbg mask streams are
        program-dependent, so a resumed run is NOT bit-equal to the
        uninterrupted one. What IS guaranteed: a loud warning at resume, and
        a statistically sane trajectory (finite losses, same magnitude as
        the uninterrupted run)."""
        import logging as _logging
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.models import zoo
        orig = zoo.create_model

        def small_create(name, **kw):
            kw.setdefault('base_width', 8)
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small_create)
        monkeypatch.setattr(train_cli, 'create_model', small_create)

        tmp, train_json, val_json = corpus

        # uninterrupted rbg run, 4 iters, dropout ON (rbg is actually used)
        args = make_args(tmp, train_json, val_json,
                         experiments_dir=str(tmp_path / 'base'),
                         iterations=4, val_iteration_interval=0,
                         checkpoint_skip=True, dropout=0.2, num_workers=0,
                         prng='rbg')
        train_cli.main(args)
        base = [json.loads(l)['loss']
                for l in open(tmp_path / 'base' / 'smoke' / 'log.json')]

        # 2 iters with a checkpoint, then resume 3-4 under rbg
        args = make_args(tmp, train_json, val_json,
                         experiments_dir=str(tmp_path / 'part'),
                         iterations=2, val_iteration_interval=2,
                         dropout=0.2, num_workers=0, prng='rbg')
        args.checkpoint_skip = False
        train_cli.main(args)
        ckpts = sorted((tmp_path / 'part' / 'smoke').glob('checkpoint_epoch*_iter*'))
        assert ckpts

        args = make_args(tmp, train_json, val_json,
                         experiments_dir=str(tmp_path / 'part'),
                         iterations=4, val_iteration_interval=0,
                         checkpoint_skip=True, dropout=0.2, num_workers=0,
                         prng='rbg')
        args.checkpoint = str(ckpts[-1])
        with caplog.at_level(_logging.WARNING, logger='convasr_tpu.train'):
            train_cli.main(args)
        assert any('rbg' in rec.message and 'bit-equal' in rec.message
                   for rec in caplog.records), \
            'expected a reproducibility warning on rbg resume'
        resumed = [json.loads(l)
                   for l in open(tmp_path / 'part' / 'smoke' / 'log.json')]
        tail = [l['loss'] for l in resumed if l['iteration'] > 2]
        assert len(tail) == 2 and all(np.isfinite(tail))
        # statistically sane: same order of magnitude as the uninterrupted run
        for got, want in zip(tail, base[2:4]):
            assert abs(got - want) <= 0.5 * abs(want) + 1.0, (got, want)


class TestDeviceCacheSpecAugment:
    def test_spec_augment_with_device_cache(self, corpus, monkeypatch, tmp_path):
        """--spec-augment + --device-cache: the on-device masks draw from the
        per-step keys regardless of feed mode; losses stay finite and differ
        from the unaugmented run (the augmentation is actually live)."""
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.models import zoo
        orig = zoo.create_model

        def small_create(name, **kw):
            kw.setdefault('base_width', 8)
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small_create)
        monkeypatch.setattr(train_cli, 'create_model', small_create)

        tmp, train_json, val_json = corpus
        losses = {}
        for mode, aug in [('plain', False), ('aug', True)]:
            args = make_args(tmp, train_json, val_json,
                             experiments_dir=str(tmp_path / mode),
                             iterations=2, val_iteration_interval=0,
                             checkpoint_skip=True, dropout=0.0, num_workers=0,
                             device_cache=True)
            args.spec_augment = aug
            train_cli.main(args)
            losses[mode] = [json.loads(l)['loss']
                            for l in open(tmp_path / mode / 'smoke' / 'log.json')]
        assert all(np.isfinite(losses['aug'])), losses['aug']
        assert losses['aug'] != losses['plain'], 'spec-augment had no effect'


class TestPreemption:
    def test_sigterm_saves_checkpoint_and_resume_matches(
            self, corpus, monkeypatch, tmp_path):
        """Preemption safety (VERDICT r3 #9): a REAL SIGTERM mid-training
        triggers a synchronous orbax save + clean exit (no exception), and
        resuming from the preemption checkpoint continues the trajectory
        bit-equal to an uninterrupted run. The signal is raised through the
        OS (os.kill) so the installed handler — not a test shim — sets the
        stop event. Reference fault story: OOM retry utils.py:126-151."""
        import signal as _signal
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.models import zoo
        orig = zoo.create_model

        def small_create(name, **kw):
            kw.setdefault('base_width', 8)
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small_create)
        monkeypatch.setattr(train_cli, 'create_model', small_create)

        tmp, train_json, val_json = corpus

        # uninterrupted baseline, 5 iters
        args = make_args(tmp, train_json, val_json,
                         experiments_dir=str(tmp_path / 'base'),
                         iterations=5, val_iteration_interval=0, epochs=4,
                         checkpoint_skip=True, dropout=0.0, num_workers=0)
        train_cli.main(args)
        base = [json.loads(l)['loss']
                for l in open(tmp_path / 'base' / 'smoke' / 'log.json')]
        assert len(base) == 5

        # preempted run: deliver SIGTERM while iteration 3 is being formed
        orig_keys = train_cli.host_fold_in_keys

        def keys_with_sigterm(seed, its):
            if max(its) + 1 >= 3:
                os.kill(os.getpid(), _signal.SIGTERM)
            return orig_keys(seed, its)
        monkeypatch.setattr(train_cli, 'host_fold_in_keys', keys_with_sigterm)
        args = make_args(tmp, train_json, val_json,
                         experiments_dir=str(tmp_path / 'pre'),
                         iterations=5, val_iteration_interval=0, epochs=4,
                         dropout=0.0, num_workers=0)
        args.checkpoint_skip = False
        train_cli.main(args)  # clean return — SIGTERM must NOT kill us
        monkeypatch.setattr(train_cli, 'host_fold_in_keys', orig_keys)

        log_path = tmp_path / 'pre' / 'smoke' / 'log.json'
        pre = [json.loads(l) for l in open(log_path)]
        stopped_at = max(l['iteration'] for l in pre)
        assert 3 <= stopped_at < 5, pre
        ckpts = sorted((tmp_path / 'pre' / 'smoke').glob(
            'checkpoint_epoch*_iter*'))
        # epoch-end boundary saves may exist too; the preemption save is the
        # one stamped with the mid-epoch iteration the run stopped at
        assert ckpts and ckpts[-1].name.endswith(f'iter{stopped_at:07d}'), \
            (ckpts, stopped_at)

        # resume from the preemption checkpoint -> iters continue to 5
        args = make_args(tmp, train_json, val_json,
                         experiments_dir=str(tmp_path / 'pre'),
                         iterations=5, val_iteration_interval=0, epochs=4,
                         checkpoint_skip=True, dropout=0.0, num_workers=0)
        args.checkpoint = str(ckpts[-1])
        train_cli.main(args)
        merged = [json.loads(l) for l in open(log_path)]
        losses = {l['iteration']: l['loss'] for l in merged}
        assert sorted(losses) == [1, 2, 3, 4, 5]
        np.testing.assert_allclose([losses[i] for i in range(1, 6)], base,
                                   rtol=1e-5, atol=1e-6)

    def test_sigterm_handler_restored_after_main(self, corpus, monkeypatch):
        """main() must restore the caller's SIGTERM disposition on exit
        (in-process callers, tests, serving co-residents)."""
        import signal as _signal
        from convasr_tpu.cli import train as train_cli
        from convasr_tpu.models import zoo
        orig = zoo.create_model

        def small_create(name, **kw):
            kw.setdefault('base_width', 8)
            return orig(name, **kw)
        monkeypatch.setattr(zoo, 'create_model', small_create)
        monkeypatch.setattr(train_cli, 'create_model', small_create)
        sentinel = lambda s, f: None  # noqa: E731
        prev = _signal.signal(_signal.SIGTERM, sentinel)
        try:
            tmp, train_json, val_json = corpus
            args = make_args(tmp, train_json, val_json, iterations=1,
                             val_iteration_interval=0, checkpoint_skip=True,
                             dropout=0.0, num_workers=0,
                             experiments_dir=str(tmp / 'exp_sig'))
            train_cli.main(args)
            assert _signal.getsignal(_signal.SIGTERM) is sentinel
        finally:
            _signal.signal(_signal.SIGTERM, prev)
