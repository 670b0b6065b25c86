"""FULL-WIDTH JasperNetBig parity vs the torch oracle (VERDICT r1 #3).

The round-1 parity tests ran tiny widths (base_width=8); this instantiates
the real 176M-param JasperNetBig in fp32, checks logits against the
independent torch spec-implementation at the reference's own fp32 export
tolerance (train.py:486-495: rtol 1e-2, atol 1e-3), and round-trips a
reference-layout .pt checkpoint through load_reference_checkpoint.
"""
import sys
import pathlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from test_model_parity import copy_weights, randomize_batch_stats
from torch_spec import SpecJasperNet

from convasr_tpu.models.zoo import create_model
from convasr_tpu.train.checkpoints import load_reference_checkpoint

FEATURES, CLASSES = 64, 38


def build_full_pair():
    model = create_model('JasperNetBig', num_input_features=FEATURES,
                         num_classes=(CLASSES,), dtype=jnp.float32,
                         normalize_features=False)
    plan = []
    in_ch = FEATURES
    for block in model._block_plan():
        kw = dict(block['kwargs'])
        plan.append((in_ch, dict(out_ch=kw['out_channels'], k=kw['kernel_size'],
                                 stride=kw.get('stride', 1),
                                 dilation=kw.get('dilation', 1),
                                 groups=kw.get('groups', 1),
                                 repeat=kw.get('repeat', 1),
                                 separable=kw.get('separable', False)),
                     block['residual_channels']))
        in_ch = kw['out_channels']
    oracle = SpecJasperNet(FEATURES, (CLASSES,), plan, 'dense',
                           temporal_mask=model.temporal_mask,
                           nonlinearity=model.nonlinearity).eval()
    return model, oracle


def oracle_to_reference_sd(oracle):
    """Dump the torch oracle into the reference checkpoint key layout
    (train.py:324-341 names: backbone.{i}.conv.{r}.0 / bn.{r} /
    conv_residual.{j} / bn_residual.{j} / decoder.0)."""
    sd = {}
    for i, block in enumerate(oracle.blocks):
        for r, conv in enumerate(block.convs):
            sd[f'backbone.{i}.conv.{r}.0.weight'] = conv.conv.weight.detach()
        for r, bn in enumerate(block.bns):
            sd[f'backbone.{i}.bn.{r}.weight'] = bn.weight.detach()
            sd[f'backbone.{i}.bn.{r}.bias'] = bn.bias.detach()
            sd[f'backbone.{i}.bn.{r}.running_mean'] = bn.running_mean
            sd[f'backbone.{i}.bn.{r}.running_var'] = bn.running_var
        for j, rconv in enumerate(block.res_convs):
            if isinstance(rconv, torch.nn.Identity):
                continue
            sd[f'backbone.{i}.conv_residual.{j}.weight'] = rconv.weight.detach()
            sd[f'backbone.{i}.conv_residual.{j}.bias'] = rconv.bias.detach()
            rbn = block.res_bns[j]
            sd[f'backbone.{i}.bn_residual.{j}.weight'] = rbn.weight.detach()
            sd[f'backbone.{i}.bn_residual.{j}.bias'] = rbn.bias.detach()
            sd[f'backbone.{i}.bn_residual.{j}.running_mean'] = rbn.running_mean
            sd[f'backbone.{i}.bn_residual.{j}.running_var'] = rbn.running_var
    sd['decoder.0.weight'] = oracle.decoder.weight.detach()
    sd['decoder.0.bias'] = oracle.decoder.bias.detach()
    return sd


@pytest.mark.slow
class TestFullScaleJasperNetBig:
    def test_full_width_parity_and_pt_roundtrip(self, tmp_path):
        model, oracle = build_full_pair()
        rng = np.random.RandomState(0)
        x = rng.randn(2, 64, FEATURES).astype(np.float32)
        xlen = np.array([1.0, 0.75], np.float32)

        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                               xlen=jnp.asarray(xlen))
        variables = randomize_batch_stats(variables, jax.random.PRNGKey(1))
        copy_weights(variables, oracle)

        out = model.apply(variables, jnp.asarray(x), xlen=jnp.asarray(xlen))
        ours = np.asarray(out['logits'][0]).transpose(0, 2, 1)
        with torch.no_grad():
            ref = oracle(torch.as_tensor(x).permute(0, 2, 1),
                         lengths_fraction=torch.as_tensor(xlen)).numpy()
        assert ours.shape == ref.shape
        # reference fp32 export tolerance (train.py:486-495)
        np.testing.assert_allclose(ours, ref, rtol=1e-2, atol=1e-3)

        # .pt conversion roundtrip at full scale: oracle -> reference-layout
        # checkpoint -> load_reference_checkpoint -> identical logits
        pt = str(tmp_path / 'jaspernetbig.pt')
        torch.save(dict(model_state_dict=oracle_to_reference_sd(oracle),
                        epoch=3, iteration=1234), pt)
        converted, meta = load_reference_checkpoint(pt)
        assert meta.get('epoch') == 3 and meta.get('iteration') == 1234
        out2 = model.apply({'params': converted['params'],
                            'batch_stats': converted['batch_stats']},
                           jnp.asarray(x), xlen=jnp.asarray(xlen))
        converted_logits = np.asarray(out2['logits'][0]).transpose(0, 2, 1)
        # exact same weights as the flax init -> bitwise-equal logits
        np.testing.assert_array_equal(converted_logits,
                                      np.asarray(out['logits'][0]).transpose(0, 2, 1))

    def test_full_width_int8_tolerance(self):
        """Full-width JasperNetBig int8 PTQ vs the f32 forward (VERDICT r2 #1
        'WER unchanged ... full-width logit-tolerance check'): the folded f32
        graph must match the flax model, and the int8 graph must track it
        (cosine + frame-argmax agreement) at real 176M-param width."""
        from convasr_tpu.models import quantized as q
        model = create_model('JasperNetBig', num_input_features=FEATURES,
                             num_classes=(CLASSES,), dtype=jnp.float32,
                             normalize_features=True)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 64, FEATURES).astype(np.float32))
        xlen = jnp.asarray([1.0, 0.75], np.float32)
        variables = model.init(jax.random.PRNGKey(0), x, xlen=xlen)
        variables = randomize_batch_stats(variables, jax.random.PRNGKey(1))

        want = np.asarray(model.apply(variables, x, xlen=xlen)['log_probs'][0])
        folded = np.asarray(q.folded_apply(model, variables, x, xlen=xlen)['log_probs'][0])
        np.testing.assert_allclose(folded, want, rtol=1e-2, atol=1e-3)

        qtree = q.quantize(model, variables, [dict(x=x, xlen=xlen)])
        got = np.asarray(q.quantized_apply(model, qtree, x, xlen=xlen)['log_probs'][0])
        cos = np.sum(want * got) / (np.linalg.norm(want) * np.linalg.norm(got) + 1e-9)
        assert cos > 0.99, cos
        agree = np.mean(want.argmax(-1) == got.argmax(-1))
        assert agree > 0.95, agree

    def test_full_width_train_step(self):
        """ONE real JasperNetBig (full width, ~176M params) train step on CPU
        with tiny T (VERDICT r2 #8): catches full-width-only breakage (remat,
        param-tree scale, optimizer-moment trees, dropout at width) that the
        tiny-width training tests cannot see."""
        import optax
        from convasr_tpu.train.loop import (TrainState, make_optimizer_with_accum,
                                            make_train_step)
        from convasr_tpu.train.optim import make_optimizer

        model = create_model('JasperNetBig', num_input_features=FEATURES,
                             num_classes=(CLASSES,), dtype=jnp.float32,
                             dropout=0.2, remat=True)
        rng = np.random.RandomState(0)
        batch = dict(x=jnp.asarray(rng.randn(2, 64, FEATURES).astype(np.float32)),
                     xlen=jnp.asarray([1.0, 0.75], np.float32),
                     y=jnp.asarray(rng.randint(0, CLASSES - 1, (2, 1, 6)), jnp.int32),
                     ylen=jnp.asarray([[6], [4]], jnp.int32))
        variables = model.init(jax.random.PRNGKey(0), batch['x'], xlen=batch['xlen'])
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree.leaves(variables['params']))
        assert n_params > 100e6, f'not full width: {n_params/1e6:.1f}M params'

        optimizer = make_optimizer_with_accum(
            make_optimizer('NovoGrad', optax.constant_schedule(1e-2),
                           momentum=0.5, weight_decay=1e-3, betas=(0.95, 0.5)),
            max_grad_norm=100.0)
        state = TrainState(step=jnp.zeros([], jnp.int32),
                           params=variables['params'],
                           batch_stats=variables.get('batch_stats', {}),
                           opt_state=optimizer.init(variables['params']))
        step = jax.jit(make_train_step(model, optimizer))
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics['loss'])), metrics
        assert float(metrics['finite']) == 1.0
        assert np.isfinite(float(metrics['grad_norm'])) and float(metrics['grad_norm']) > 0
        assert int(state.step) == 1

    def test_full_width_b256_step(self):
        """Full-width JasperNetBig at the reference's operating batch size
        (VERDICT r3 #4; /root/reference/scripts/train.sh bs=256): one real
        B=256 train step with tiny T on CPU — catches batch-scale breakage
        (B-dependent reshapes, remat at width x batch, CTC batch handling)
        that B=2 cannot. On-chip throughput for this configuration is
        recorded in COMPONENTS.md (533 ms/step = 2,882 audio-s/s at 6 s)."""
        import optax
        from convasr_tpu.train.loop import (TrainState, make_optimizer_with_accum,
                                            make_train_step)
        from convasr_tpu.train.optim import make_optimizer

        model = create_model('JasperNetBig', num_input_features=FEATURES,
                             num_classes=(CLASSES,), dtype=jnp.float32,
                             dropout=0.2, remat=True)
        B = 256
        rng = np.random.RandomState(0)
        batch = dict(x=jnp.asarray(rng.randn(B, 16, FEATURES).astype(np.float32)),
                     xlen=jnp.asarray(rng.uniform(0.5, 1.0, B).astype(np.float32)),
                     y=jnp.asarray(rng.randint(0, CLASSES - 1, (B, 1, 2)), jnp.int32),
                     ylen=jnp.full((B, 1), 2, jnp.int32))
        variables = model.init(jax.random.PRNGKey(0), batch['x'][:2],
                               xlen=batch['xlen'][:2])
        optimizer = make_optimizer_with_accum(
            make_optimizer('NovoGrad', optax.constant_schedule(1e-2),
                           momentum=0.5, weight_decay=1e-3, betas=(0.95, 0.5)),
            max_grad_norm=100.0)
        state = TrainState(step=jnp.zeros([], jnp.int32),
                           params=variables['params'],
                           batch_stats=variables.get('batch_stats', {}),
                           opt_state=optimizer.init(variables['params']))
        step = jax.jit(make_train_step(model, optimizer))
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics['loss'])), metrics
        assert float(metrics['finite']) == 1.0
        assert int(state.step) == 1
