"""Export (StableHLO) + BN-fusion parity tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convasr_tpu.cli.export import export_model, fuse_conv_bn, validate_export
from convasr_tpu.models.jasper import JasperNet


@pytest.fixture(scope='module')
def model_and_vars():
    model = JasperNet(num_input_features=8, num_classes=(6,), repeat=2, num_subblocks=1,
                      residual='dense', kernel_sizes=(3,), kernel_size_prologue=3,
                      kernel_size_epilogue=3, base_width=4, out_width_factors=(2,),
                      out_width_factors_large=(3, 3), dropout=0.0, temporal_mask=False)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 8).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    # perturb batch stats so fusion actually does something
    variables = dict(variables)
    variables['batch_stats'] = jax.tree.map(
        lambda a: jnp.abs(a + 0.3) + 0.05, variables['batch_stats'])
    return model, variables, x


class TestBNFusion:
    def test_outputs_identical(self, model_and_vars):
        model, variables, x = model_and_vars
        fused_params, fused_stats = fuse_conv_bn(variables['params'],
                                                 variables['batch_stats'])
        out = model.apply(variables, x)['logits'][0]
        out_fused = model.apply({'params': fused_params, 'batch_stats': fused_stats},
                                x)['logits'][0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_fused),
                                   rtol=1e-5, atol=1e-5)

    def test_stats_are_identity(self, model_and_vars):
        model, variables, x = model_and_vars
        _, fused_stats = fuse_conv_bn(variables['params'], variables['batch_stats'])
        for leaf_path, leaf in jax.tree_util.tree_leaves_with_path(fused_stats):
            name = jax.tree_util.keystr(leaf_path)
            if 'mean' in name:
                np.testing.assert_allclose(np.asarray(leaf), 0.0)


class TestStableHLOExport:
    def test_export_and_parity(self, model_and_vars, tmp_path):
        model, variables, x = model_and_vars
        xlen = jnp.ones((2,), jnp.float32)
        path = str(tmp_path / 'model.stablehlo')
        export_model(model, variables, x, xlen, path)
        assert validate_export(model, variables, x, xlen, path)


class TestInt8Export:
    def test_quantized_export_roundtrip(self, model_and_vars, tmp_path):
        """int8 PTQ artifact + .qtree.npz sidecar (cli/export.py --quantize
        int8): the deserialized artifact fed the reloaded sidecar must match
        the live quantized graph exactly."""
        from convasr_tpu.cli.export import (export_quantized,
                                            validate_quantized_export)
        from convasr_tpu.models.quantized import load_qtree, save_qtree

        model, variables, x = model_and_vars
        xlen = jnp.ones((2,), jnp.float32)
        path = str(tmp_path / 'model_int8.stablehlo')
        _, qtree = export_quantized(model, variables,
                                    [dict(x=np.asarray(x),
                                          xlen=np.asarray(xlen))], x, xlen, path)
        assert validate_quantized_export(model, x, xlen, path)
        # sidecar roundtrip preserves every leaf bit-for-bit (incl. int8)
        reloaded = load_qtree(path + '.qtree.npz')
        flat_a = jax.tree_util.tree_flatten_with_path(qtree)[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(reloaded)[0])
        for kp, leaf in flat_a:
            other = flat_b[kp]
            assert np.asarray(other).dtype == np.asarray(leaf).dtype, kp
            np.testing.assert_array_equal(np.asarray(other), np.asarray(leaf))
