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
