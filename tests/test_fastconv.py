"""fastconv must match lax.conv_general_dilated exactly (up to reassoc)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uavdet_tpu.ops.fastconv import (
    conv3x3_s1_small, conv3x3_s2_small, use_fast_conv3x3)


def _ref_conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("i,o,h", [(3, 32, 16), (12, 8, 32), (32, 64, 16)])
def test_s1_matches_conv(rng, i, o, h):
    x = jnp.asarray(rng.normal(size=(2, h, h, i)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, i, o)).astype(np.float32))
    got = conv3x3_s1_small(x, w, block=4)
    want = _ref_conv(x, w, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("i,o,h", [(3, 32, 16), (32, 64, 32)])
def test_s2_matches_conv(rng, i, o, h):
    x = jnp.asarray(rng.normal(size=(2, h, h, i)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, i, o)).astype(np.float32))
    got = conv3x3_s2_small(x, w)
    want = _ref_conv(x, w, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_per_sample_kernels_match_loop(rng):
    b, h, i, o = 3, 16, 3, 8
    x = jnp.asarray(rng.normal(size=(b, h, h, i)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(b, 3, 3, i, o)).astype(np.float32))
    for fn, stride in ((conv3x3_s1_small, 1), (conv3x3_s2_small, 2)):
        got = fn(x, ws)
        want = jnp.concatenate(
            [_ref_conv(x[k:k + 1], ws[k], stride) for k in range(b)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_differentiable(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4)).astype(np.float32))
    g = jax.grad(lambda w: jnp.sum(conv3x3_s1_small(x, w) ** 2))(w)
    g_ref = jax.grad(lambda w: jnp.sum(_ref_conv(x, w, 1) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_dispatch_predicate(monkeypatch):
    monkeypatch.setenv("UAVDET_FASTCONV", "1")
    assert use_fast_conv3x3(3, 3, 1)
    assert use_fast_conv3x3(32, (3, 3), (2, 2))
    assert not use_fast_conv3x3(64, 3, 1)
    assert not use_fast_conv3x3(3, 1, 1)
    monkeypatch.setenv("UAVDET_FASTCONV", "0")
    assert not use_fast_conv3x3(3, 3, 1)
