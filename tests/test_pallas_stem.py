"""Pallas fused stem vs the stacked-conv reference path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uavdet_tpu.ops.pallas_stem import mix_and_fold, pallas_dyconv_stem


def _reference_stem(x, e1, a1, bn1, e2, a2, bn2):
    """Stacked-expert conv + contraction + BN(inference) + SiLU, twice."""
    def dyconv(x, experts, attn, bn, stride, out_c):
        y = jax.lax.conv_general_dilated(
            x, experts.astype(x.dtype), (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, w, _ = y.shape
        e = experts.shape[-1] // out_c
        y = y.reshape(b, h, w, e, out_c)
        y = jnp.einsum("bhwec,be->bhwc", y, attn.astype(y.dtype))
        scale, bias, mean, var = bn
        y = (y - mean) / jnp.sqrt(var + 1e-5) * scale + bias
        return y * jax.nn.sigmoid(y)

    x = dyconv(x.astype(jnp.float32), e1, a1, bn1, 1, 32)
    return dyconv(x, e2, a2, bn2, 2, 64)


def _case(rng, b=2, h=64, w=64):
    x = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
    e1 = (rng.normal(size=(3, 3, 3, 4 * 32)) * 0.2).astype(np.float32)
    e2 = (rng.normal(size=(3, 3, 32, 4 * 64)) * 0.05).astype(np.float32)
    a1 = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(b, 4)).astype(np.float32)), -1)
    a2 = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(b, 4)).astype(np.float32)), -1)
    bn1 = tuple(jnp.asarray(v.astype(np.float32)) for v in (
        rng.uniform(0.5, 1.5, 32), rng.normal(size=32) * 0.1,
        rng.normal(size=32) * 0.1, rng.uniform(0.5, 1.5, 32)))
    bn2 = tuple(jnp.asarray(v.astype(np.float32)) for v in (
        rng.uniform(0.5, 1.5, 64), rng.normal(size=64) * 0.1,
        rng.normal(size=64) * 0.1, rng.uniform(0.5, 1.5, 64)))
    return (jnp.asarray(x), jnp.asarray(e1), a1, bn1,
            jnp.asarray(e2), a2, bn2)


def test_stem_matches_reference_interpret(rng):
    x, e1, a1, bn1, e2, a2, bn2 = _case(rng)
    k1 = mix_and_fold(e1, a1, *bn1, out_channels=32)
    k2 = mix_and_fold(e2, a2, *bn2, out_channels=64)
    got = pallas_dyconv_stem(x, k1, k2, tr2=8, interpret=True)
    want = _reference_stem(x, e1, a1, bn1, e2, a2, bn2)
    assert got.shape == want.shape == (2, 32, 32, 64)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.1, atol=0.02)  # bf16 activations in the kernel path
    # tighter check on correlation / scale
    g = np.asarray(got, np.float32).ravel()
    r = np.asarray(want, np.float32).ravel()
    corr = np.corrcoef(g, r)[0, 1]
    assert corr > 0.999, corr


def test_stem_edge_rows_are_zero_padded(rng):
    """Top/bottom L2 rows must see zero L1 padding (not silu(bias))."""
    x, e1, a1, bn1, e2, a2, bn2 = _case(rng, b=1, h=32, w=32)
    k1 = mix_and_fold(e1, a1, *bn1, out_channels=32)
    k2 = mix_and_fold(e2, a2, *bn2, out_channels=64)
    got = pallas_dyconv_stem(x, k1, k2, tr2=8, interpret=True)
    want = _reference_stem(x, e1, a1, bn1, e2, a2, bn2)
    # compare the very first and last output rows specifically
    np.testing.assert_allclose(
        np.asarray(got[:, 0], np.float32), np.asarray(want[:, 0],
                                                      np.float32),
        rtol=0.1, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(got[:, -1], np.float32), np.asarray(want[:, -1],
                                                       np.float32),
        rtol=0.1, atol=0.02)
