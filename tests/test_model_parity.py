"""Flax JasperNet vs independent torch spec-implementation parity tests.

Weights are copied from the initialized Flax model into the torch oracle
(tests/torch_spec.py) and eval-mode outputs compared. Covers dense/plain/
residual/flat topologies, separable convs, dilation, strides, temporal masks.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from convasr_tpu.models.jasper import JasperNet
from convasr_tpu.models.zoo import MODEL_CONFIGS, create_model
from torch_spec import SpecJasperNet


def build_pair(residual='dense', separable=False, groups=1, dilation=1,
               nonlinearity=('relu',), temporal_mask=True, num_subblocks=1, repeat=2):
    """Build a tiny flax model + torch oracle with identical topology."""
    model = JasperNet(
        num_input_features=8, num_classes=(11,), repeat=repeat, num_subblocks=num_subblocks,
        dilation=dilation, residual=residual, kernel_sizes=(3, 5), kernel_size_prologue=3,
        kernel_size_epilogue=5, base_width=8, out_width_factors=(2, 3),
        out_width_factors_large=(4, 5), separable=separable, groups=groups,
        dropout=0.0, temporal_mask=temporal_mask, nonlinearity=nonlinearity, stride1=2)

    plan = []
    in_ch = 8
    for block in model._block_plan():
        kw = dict(block['kwargs'])
        t_kwargs = dict(out_ch=kw['out_channels'], k=kw['kernel_size'],
                        stride=kw.get('stride', 1), dilation=kw.get('dilation', 1),
                        groups=kw.get('groups', 1), repeat=kw.get('repeat', 1),
                        separable=kw.get('separable', False))
        plan.append((in_ch, t_kwargs, block['residual_channels']))
        in_ch = kw['out_channels']
    oracle = SpecJasperNet(8, (11,), plan, residual, temporal_mask=temporal_mask,
                           nonlinearity=nonlinearity).eval()
    return model, oracle


def copy_weights(variables, oracle):
    """Copy flax params/batch_stats into the torch oracle."""
    params, stats = variables['params'], variables['batch_stats']

    def conv_to_torch(kernel):  # (k, in/g, out) -> (out, in/g, k)
        return torch.as_tensor(np.asarray(kernel).transpose(2, 1, 0))

    with torch.no_grad():
        for i, block in enumerate(oracle.blocks):
            p, s = params[f'block{i}'], stats[f'block{i}']
            for r, conv in enumerate(block.convs):
                cp = p[f'conv{r}']
                if hasattr(conv, 'conv'):
                    conv.conv.weight.copy_(conv_to_torch(cp['conv']['kernel']))
                else:
                    conv.depthwise.weight.copy_(conv_to_torch(cp['depthwise']['kernel']))
                    conv.depthwise.bias.copy_(torch.as_tensor(np.asarray(cp['depthwise']['bias'])))
                    conv.pointwise.weight.copy_(conv_to_torch(cp['pointwise']['kernel']))
                bn, bp, bs = block.bns[r], p[f'bn{r}'], s[f'bn{r}']
                bn.weight.copy_(torch.as_tensor(np.asarray(bp['scale'])))
                bn.bias.copy_(torch.as_tensor(np.asarray(bp['bias'])))
                bn.running_mean.copy_(torch.as_tensor(np.asarray(bs['mean'])))
                bn.running_var.copy_(torch.as_tensor(np.asarray(bs['var'])))
            for j, rconv in enumerate(block.res_convs):
                if isinstance(rconv, torch.nn.Identity):
                    continue
                rp, rs = p[f'conv_residual{j}'], s[f'bn_residual{j}']
                rconv.weight.copy_(conv_to_torch(rp['kernel']))
                rconv.bias.copy_(torch.as_tensor(np.asarray(rp['bias'])))
                rbn = block.res_bns[j]
                rbp = p[f'bn_residual{j}']
                rbn.weight.copy_(torch.as_tensor(np.asarray(rbp['scale'])))
                rbn.bias.copy_(torch.as_tensor(np.asarray(rbp['bias'])))
                rbn.running_mean.copy_(torch.as_tensor(np.asarray(rs['mean'])))
                rbn.running_var.copy_(torch.as_tensor(np.asarray(rs['var'])))
        dp = params['decoder']['head0']
        oracle.decoder.weight.copy_(conv_to_torch(dp['kernel']))
        oracle.decoder.bias.copy_(torch.as_tensor(np.asarray(dp['bias'])))


def randomize_batch_stats(variables, key):
    """Perturb running stats so eval-mode BN actually exercises them."""
    stats = variables['batch_stats']
    leaves, treedef = jax.tree.flatten(stats)
    keys = jax.random.split(key, len(leaves))
    new = [jnp.abs(leaf + 0.3 * jax.random.normal(k, leaf.shape)) + 0.1
           for leaf, k in zip(leaves, keys)]
    return {**variables, 'batch_stats': jax.tree.unflatten(treedef, new)}


def run_pair(residual='dense', xlen=None, **kwargs):
    model, oracle = build_pair(residual=residual, **kwargs)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 8).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           xlen=jnp.asarray(xlen) if xlen is not None else None)
    variables = randomize_batch_stats(variables, jax.random.PRNGKey(1))
    copy_weights(variables, oracle)

    out = model.apply(variables, jnp.asarray(x),
                      xlen=jnp.asarray(xlen) if xlen is not None else None)
    ours = np.asarray(out['logits'][0]).transpose(0, 2, 1)  # -> (B, C, T)
    with torch.no_grad():
        ref = oracle(torch.as_tensor(x).permute(0, 2, 1),
                     lengths_fraction=torch.as_tensor(xlen) if xlen is not None else None).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
    return out


class TestJasperParity:
    def test_dense(self):
        run_pair(residual='dense')

    def test_plain(self):
        run_pair(residual=False)

    def test_residual(self):
        run_pair(residual=True)

    def test_flat(self):
        model, oracle = build_pair(residual='flat')
        # flat topology requires equal widths; rebuild with flat-compatible factors
        model = JasperNet(num_input_features=8, num_classes=(11,), repeat=2,
                          num_subblocks=1, residual='flat', kernel_sizes=(3, 5),
                          kernel_size_prologue=3, kernel_size_epilogue=5, base_width=8,
                          out_width_factors=(2, 2), out_width_factors_large=(4, 4),
                          dropout=0.0, temporal_mask=True, stride1=2)
        plan = []
        in_ch = 8
        for block in model._block_plan():
            kw = dict(block['kwargs'])
            plan.append((in_ch, dict(out_ch=kw['out_channels'], k=kw['kernel_size'],
                                     stride=kw.get('stride', 1), dilation=kw.get('dilation', 1),
                                     groups=kw.get('groups', 1), repeat=kw.get('repeat', 1),
                                     separable=kw.get('separable', False)),
                         block['residual_channels']))
            in_ch = kw['out_channels']
        from torch_spec import SpecJasperNet
        oracle = SpecJasperNet(8, (11,), plan, 'flat').eval()
        rng = np.random.RandomState(0)
        x = rng.randn(2, 32, 8).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = randomize_batch_stats(variables, jax.random.PRNGKey(1))
        copy_weights(variables, oracle)
        out = model.apply(variables, jnp.asarray(x))
        ours = np.asarray(out['logits'][0]).transpose(0, 2, 1)
        with torch.no_grad():
            ref = oracle(torch.as_tensor(x).permute(0, 2, 1)).numpy()
        # exact in float64 (4.5e-8); equal-width identity-residual chains
        # amplify f32 accumulation noise, hence the looser tolerance
        np.testing.assert_allclose(ours, ref, rtol=1e-2, atol=2e-3)

    def test_separable_groups(self):
        run_pair(residual=False, separable=True, groups=8)

    def test_dilation(self):
        run_pair(residual='dense', dilation=2)

    def test_hardtanh(self):
        run_pair(residual='dense', nonlinearity=('hardtanh', 0, 20))

    def test_leaky_relu(self):
        run_pair(residual='dense', nonlinearity=('leaky_relu', 0.01))

    def test_with_xlen_mask(self):
        run_pair(residual='dense', xlen=np.array([1.0, 0.5], dtype=np.float32))

    def test_num_subblocks_2(self):
        run_pair(residual='dense', num_subblocks=2)

    def test_olen_and_log_probs(self):
        model, _ = build_pair()
        x = np.random.RandomState(1).randn(2, 32, 8).astype(np.float32)
        xlen = jnp.asarray([1.0, 0.5])
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), xlen=xlen)
        out = model.apply(variables, jnp.asarray(x), xlen=xlen)
        T_out = out['logits'][0].shape[1]
        np.testing.assert_array_equal(np.asarray(out['olen'][0]),
                                      [T_out, int(np.ceil(0.5 * T_out))])
        probs = np.exp(np.asarray(out['log_probs'][0]))
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)


class TestModelZoo:
    def test_all_configs_instantiate(self):
        for name in MODEL_CONFIGS:
            model = create_model(name, num_input_features=8, num_classes=(11,), base_width=8)
            assert model is not None

    def test_zoo_has_reference_names(self):
        required = [
            'Wav2Letter', 'Wav2LetterResidual', 'Wav2LetterResidualNoDilation',
            'Wav2LetterResidualBig', 'Wav2LetterDense', 'Wav2LetterDenseNoDilation',
            'Wav2LetterDenseNoDilationInplace', 'Wav2LetterDenseLargeKernels',
            'Wav2LetterDenseNoDilationLargeKernels', 'Wav2LetterDenseBig',
            'Wav2LetterDenseBigLargeKernelsNoDropoutReLu',
            'Wav2LetterDenseBigLargeKernelsNoDilationNoDropoutReLu',
            'Wav2LetterDenseBigLargeKernelsNoDilationNoTemporalMaskNoDropoutReLu',
            'Wav2LetterFlat', 'JasperNetSeparable', 'JasperNetSmall',
            'JasperNetSmallInstanceNorm', 'JasperNetSmallTrainableInstanceNorm',
            'JasperNetLarge', 'JasperNetBig', 'JasperNetBigNoStride',
            'JasperNetBigBpeOnly', 'JasperNetResidualBig', 'JasperNetBigInplace',
        ]
        for name in required:
            assert name in MODEL_CONFIGS, name

    def test_small_zoo_forward(self):
        model = create_model('JasperNetSmall', num_input_features=8, num_classes=(11,),
                             base_width=8)
        x = np.random.RandomState(0).randn(1, 32, 8).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = model.apply(variables, jnp.asarray(x))
        assert out['logits'][0].shape == (1, 16, 11)  # stride1=2 halves time
