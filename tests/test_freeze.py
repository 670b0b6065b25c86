"""Layer freezing: frozen blocks must not change during training."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convasr_tpu.train.loop import (
    freeze_mask, init_train_state, make_optimizer_with_accum, make_train_step,
)
from convasr_tpu.train.optim import make_optimizer
from test_train_integration import synth_batch, tiny_model


class TestFreeze:
    def test_mask_structure(self):
        model = tiny_model()
        batch = synth_batch(np.random.RandomState(0))
        variables = model.init(jax.random.PRNGKey(0), batch['x'], xlen=batch['xlen'])
        mask = freeze_mask(variables['params'], freeze_backbone=1, freeze_decoder0=True)
        flat = {jax.tree_util.keystr(p): v
                for p, v in jax.tree_util.tree_leaves_with_path(mask)}
        assert any('block0' in k and v is False for k, v in flat.items())
        assert any('block1' in k and v is True for k, v in flat.items())
        assert all(v is False for k, v in flat.items() if 'head0' in k)

    def test_frozen_params_unchanged(self):
        model = tiny_model()
        rng = np.random.RandomState(1)
        batch = synth_batch(rng)
        variables = model.init(jax.random.PRNGKey(0), batch['x'], xlen=batch['xlen'])
        mask = freeze_mask(variables['params'], freeze_backbone=1)
        optimizer = make_optimizer_with_accum(make_optimizer('sgd', lambda s: 1e-2),
                                              trainable_mask=mask)
        state = init_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, optimizer))
        p0 = jax.device_get(state.params)
        for i in range(3):
            state, _ = step(state, batch, jax.random.PRNGKey(i))
        p1 = jax.device_get(state.params)
        for (path, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(p0),
                                     jax.tree_util.tree_leaves_with_path(p1)):
            name = jax.tree_util.keystr(path)
            if 'block0' in name:
                np.testing.assert_array_equal(a, b, err_msg=name)
            elif 'block1' in name and 'kernel' in name:
                assert not np.array_equal(a, b), name  # trainable blocks move
