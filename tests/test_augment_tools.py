"""SpecAugment + openstt split-builder + stt-clients registry tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestSpecAugment:
    def test_masks_applied(self):
        from convasr_tpu.frontend.augment import spec_augment
        x = jnp.ones((2, 100, 64))
        out = np.asarray(spec_augment(x, jax.random.PRNGKey(0),
                                      num_time_masks=2, time_mask_width=20,
                                      num_freq_masks=2, freq_mask_width=10))
        assert out.shape == x.shape
        assert (out == 0).any()
        assert (out == 1).any()  # not everything masked

    def test_no_masks_identity(self):
        from convasr_tpu.frontend.augment import spec_augment
        x = jnp.asarray(np.random.RandomState(0).randn(1, 50, 8).astype(np.float32))
        out = spec_augment(x, jax.random.PRNGKey(0), num_time_masks=0, num_freq_masks=0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_jit(self):
        from convasr_tpu.frontend.augment import spec_augment
        f = jax.jit(lambda x, k: spec_augment(x, k))
        out = f(jnp.ones((2, 64, 16)), jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(out)).all()

    def test_length_bounded_time_masks(self):
        from convasr_tpu.frontend.augment import spec_augment
        x = jnp.ones((1, 100, 8))
        lengths = jnp.asarray([40])
        out = np.asarray(spec_augment(x, jax.random.PRNGKey(2), num_time_masks=4,
                                      time_mask_width=10, num_freq_masks=0,
                                      lengths=lengths))
        # frames beyond padded region + mask width must stay untouched
        assert (out[0, 55:] == 1).all()


class TestOpensttSplit:
    def test_split_fraction_and_none(self):
        from convasr_tpu.tools.openstt import split
        by_group = dict(a=[dict(i=i) for i in range(100)])
        res = split(by_group, ['a'], dict(train=0.9, val=None))
        assert len(res['train']) == 90
        assert len(res['val']) == 10
        seen = {t['i'] for t in res['train']} | {t['i'] for t in res['val']}
        assert seen == set(range(100))

    def test_split_deterministic(self):
        from convasr_tpu.tools.openstt import split
        by_group = dict(a=[dict(i=i) for i in range(50)])
        r1 = split(by_group, ['a'], dict(train=0.8, val=None))
        r2 = split(by_group, ['a'], dict(train=0.8, val=None))
        assert r1 == r2


class TestSTTClients:
    def test_registry(self):
        from convasr_tpu.tools.stt_clients import VENDORS
        assert set(VENDORS) == {'self', 'google', 'yandex', 'tinkoff', 'silero'}


class TestTimeWarp:
    def test_warp_preserves_shape_and_range(self):
        import jax
        import jax.numpy as jnp
        from convasr_tpu.frontend.augment import time_warp
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(3, 100, 8).astype(np.float32))
        out = np.asarray(time_warp(x, jax.random.PRNGKey(0), warp_width=20))
        assert out.shape == x.shape
        # interpolation: values bounded by neighbourhood extremes
        assert out.min() >= float(x.min()) - 1e-5
        assert out.max() <= float(x.max()) + 1e-5
        assert not np.allclose(out, np.asarray(x))  # actually warped

    def test_short_input_passthrough(self):
        import jax
        import jax.numpy as jnp
        from convasr_tpu.frontend.augment import time_warp
        x = jnp.ones((1, 16, 4))
        out = time_warp(x, jax.random.PRNGKey(0), warp_width=40)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_spec_augment_with_warp_jits(self):
        import jax
        import jax.numpy as jnp
        from convasr_tpu.frontend.augment import spec_augment
        x = jnp.asarray(np.random.RandomState(1).randn(2, 120, 16).astype(np.float32))
        f = jax.jit(lambda x, k: spec_augment(x, k, time_warp_width=30))
        out = np.asarray(f(x, jax.random.PRNGKey(2)))
        assert out.shape == x.shape and np.isfinite(out).all()
