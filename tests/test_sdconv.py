"""sdconv phase-decomposed convs must match lax.conv exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uavdet_tpu.ops.sdconv import (
    conv3x3_s1_sd, conv3x3_s2_sd, depth_to_space, space_to_depth)


def _ref(x, w, s):
    return jax.lax.conv_general_dilated(
        x, w, (s, s), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 5)).astype(np.float32))
    for b in (2, 4):
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x, b), b)),
            np.asarray(x))


@pytest.mark.parametrize("i,o,h", [(3, 32, 16), (32, 64, 32), (12, 8, 24)])
def test_s2_exact(rng, i, o, h):
    x = jnp.asarray(rng.normal(size=(2, h, h, i)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, i, o)).astype(np.float32))
    got = conv3x3_s2_sd(x, w)
    want = _ref(x, w, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("i,o,h,blk", [(3, 8, 16, 4), (3, 8, 16, 2),
                                       (6, 4, 24, 4)])
def test_s1_exact(rng, i, o, h, blk):
    x = jnp.asarray(rng.normal(size=(2, h, h, i)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, i, o)).astype(np.float32))
    got = conv3x3_s1_sd(x, w, blk=blk)
    want = _ref(x, w, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_differentiable(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4)).astype(np.float32))
    g1 = jax.grad(lambda w: jnp.sum(conv3x3_s2_sd(x, w) ** 2))(w)
    g2 = jax.grad(lambda w: jnp.sum(_ref(x, w, 2) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-3)
