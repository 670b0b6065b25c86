"""Shape-marker DSL + runtime enforcement (spec: /root/reference/shaping.py:6-83)."""
import jax.numpy as jnp
import numpy as np
import pytest

from convasr_tpu.infra import shaping
from convasr_tpu.ops import ctc


def test_ndim_of_markers():
    assert shaping.ndim_of(shaping.B) == 1
    assert shaping.ndim_of(shaping.BT) == 2
    assert shaping.ndim_of(shaping.BTC) == 3
    assert shaping.ndim_of(shaping.BCT) == 3
    assert shaping.ndim_of(int) is None
    assert shaping.ndim_of(None) is None


def test_markers_are_subscriptable():
    # reference annotations write shaping.BCT['...'] — subscripting is a no-op
    assert shaping.BCT['float32'] is shaping.BCT


def test_shapecheck_accepts_and_rejects():
    @shaping.shapecheck
    def f(x: shaping.BT, n: int = 0):
        return x.sum() + n

    assert f(np.zeros((2, 3)), n=1) == 1.0
    with pytest.raises(AssertionError, match='expected BT'):
        f(np.zeros((2, 3, 4)))
    # non-array values for annotated-as-int params are ignored
    assert f(np.zeros((1, 1)), n=2) == 2.0


def test_shapecheck_cross_argument_axis_consistency():
    # ADVICE r4: shared axis letters must have equal sizes across arguments
    @shaping.shapecheck
    def f(x: shaping.BTC, y: shaping.BY):
        return 0

    assert f(np.zeros((2, 5, 4)), np.zeros((2, 7))) == 0
    with pytest.raises(AssertionError, match='inconsistent'):
        f(np.zeros((2, 5, 4)), np.zeros((3, 7)))


def test_shapecheck_unwraps_optional():
    import typing

    @shaping.shapecheck
    def f(x: shaping.BT, mask: typing.Optional[shaping.BT] = None):
        return 0

    assert f(np.zeros((2, 3))) == 0
    assert f(np.zeros((2, 3)), np.zeros((2, 3))) == 0
    with pytest.raises(AssertionError, match='inconsistent'):
        f(np.zeros((2, 3)), np.zeros((2, 4)))


def test_check_xlen_enforces_fraction_convention():
    assert shaping.check_xlen(None, 2) is None
    ok = np.array([0.5, 1.0], np.float32)
    assert shaping.check_xlen(ok, 2) is ok
    with pytest.raises(AssertionError, match='FRACTION'):
        shaping.check_xlen(np.array([100, 200]), 2)     # absolute lengths
    with pytest.raises(AssertionError, match='batch'):
        shaping.check_xlen(np.ones(3, np.float32), 2)
    with pytest.raises(AssertionError, match='fraction'):
        shaping.check_xlen(np.float32(0.5), 2)          # scalar, not (B,)


def test_compute_output_lengths_rejects_integer_xlen():
    # the single choke-point every xlen flows through (SURVEY §7.3)
    from convasr_tpu.frontend.logmel import compute_output_lengths
    out = compute_output_lengths(100, jnp.array([0.5, 1.0], jnp.float32))
    assert out.tolist() == [50, 100]
    with pytest.raises(AssertionError, match='FRACTION'):
        compute_output_lengths(100, jnp.array([50, 80], jnp.int32))


def test_frontend_and_model_seams_enforced():
    from convasr_tpu.frontend.logmel import LogFilterBankFrontend, masked_instance_norm
    fe = LogFilterBankFrontend(out_channels=16, sample_rate=8000,
                               window_size=0.02, window_stride=0.01, dither=0)
    with pytest.raises(AssertionError, match='expected BT'):
        fe(jnp.zeros((2, 800, 1)))                      # (B, T, C) signal
    with pytest.raises(AssertionError, match='inconsistent'):
        fe(jnp.zeros((2, 800)), mask=jnp.zeros((3, 800)))
    with pytest.raises(AssertionError, match='expected BTC'):
        masked_instance_norm(jnp.zeros((2, 800)))

    import jax
    from convasr_tpu.models.jasper import JasperNet
    model = JasperNet(num_input_features=16, num_classes=(5,), base_width=8)
    x = jnp.zeros((2, 10, 16))
    with pytest.raises(AssertionError, match='FRACTION'):
        model.init(jax.random.PRNGKey(0), x, xlen=jnp.array([5, 7], jnp.int32))
    with pytest.raises(AssertionError, match='batch'):
        model.init(jax.random.PRNGKey(0), x, xlen=jnp.ones((3,), jnp.float32))


def test_beam_entry_points_enforce_shapes():
    from convasr_tpu.ops.beam_device import beam_search_device
    lp = jnp.log(jnp.full((2, 6, 4), 0.25))
    with pytest.raises(AssertionError, match='inconsistent'):
        beam_search_device(lp, jnp.array([6, 6, 6], jnp.int32), 3)
    with pytest.raises(AssertionError, match='expected BTC'):
        beam_search_device(lp[0], jnp.array([6, 6], jnp.int32), 3)


def test_ctc_entry_points_enforce_btc():
    lp = jnp.log(jnp.full((2, 5, 4), 0.25))
    y = jnp.array([[1, 2], [1, 0]], dtype=jnp.int32)
    ilen = jnp.array([5, 5])
    ylen = jnp.array([2, 1])
    # correct shapes pass
    loss = ctc.ctc_loss(lp, y, ilen, ylen)
    assert loss.shape == (2,)
    ali = ctc.ctc_alignment(lp, y, ilen, ylen)
    assert ali.shape == y.shape
    # channels-first input (the reference layout) is rejected loudly
    with pytest.raises(AssertionError, match='expected BTC'):
        ctc.ctc_loss(lp[0], y, ilen, ylen)
    with pytest.raises(AssertionError, match='expected BY'):
        ctc.ctc_alignment(lp, y[:, :, None], ilen, ylen)
