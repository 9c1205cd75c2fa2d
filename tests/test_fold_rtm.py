"""Parity of the parity-folded RTM front (ops/fold_rtm) against the
full RTMUAVDet forward.

The folded stem phase convs apply the ORIGINAL 5x5 kernel at stride 4
with phase offsets (identical 25-tap windows), and the folded base conv
embeds the original 3x3 s2 weights with exact zeros
(fold_kernel_3x3_s2) — reassociation-level equal: tight f32 tolerances
and near-exact f64. Both stem-extent parities are covered (input 15 →
stem 7 rows, odd: the fold's zero-pad row is exercised; input 17 →
stem 8, even: no mask)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uavdet_tpu.models.rtm_uav_det import RTMUAVDet
from uavdet_tpu.ops.fold_rtm import fold_rtm_front

ANCHORS = (((29, 23), (48, 30), (67, 38)),
           ((91, 54), (120, 75), (157, 60)))


@pytest.fixture
def rng():
    return np.random.default_rng(13)


def _models(dtype, size, seed=0):
    full = RTMUAVDet(anchors=ANCHORS, det_scales=(4, 2), dtype=dtype)
    x0 = jnp.zeros((1, size, size, 3), dtype or jnp.float32)
    variables = full.init({"params": jax.random.key(seed)}, x0)
    folded = RTMUAVDet(anchors=ANCHORS, det_scales=(4, 2),
                       stem_folded=True, dtype=dtype)
    front = fold_rtm_front(variables, dtype=dtype or jnp.float32)
    return full, folded, front, variables


def _assert_outs_close(out, ref, **tol):
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(b, np.float64),
                                   np.asarray(a, np.float64), **tol)


@pytest.mark.parametrize("size", [15, 17])
def test_folded_front_matches_full_f32(rng, size):
    full, folded, front, variables = _models(None, size)
    x = jnp.asarray(rng.normal(size=(2, size, size, 3)).astype(np.float32))
    ref = full.apply(variables, x, train=False)
    out = folded.apply(variables, front(x), train=False)
    _assert_outs_close(out, ref, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("size", [15, 17])
def test_folded_front_matches_full_f64(rng, size):
    """f64 separates bug from reassociation noise (CLAUDE.md lesson)."""
    with jax.enable_x64(True):
        full, folded, front, variables = _models(jnp.float64, size)
        x = jnp.asarray(rng.normal(size=(1, size, size, 3))).astype(
            jnp.float64)
        ref = full.apply(variables, x, train=False)
        out = folded.apply(variables, front(x), train=False)
    _assert_outs_close(out, ref, rtol=1e-12, atol=1e-13)


def test_uint8_front_folds_the_255(rng):
    """uint8 input folds /255 into the stem kernel — must match the
    float path fed x/255 (pure linearity; f32 rounding only)."""
    _, folded, front, variables = _models(None, 17)
    u8 = rng.integers(0, 256, size=(2, 17, 17, 3), dtype=np.uint8)
    out_u8 = folded.apply(variables, front(jnp.asarray(u8)), train=False)
    out_f = folded.apply(
        variables, front(jnp.asarray(u8.astype(np.float32) / 255.0)),
        train=False)
    _assert_outs_close(out_u8, out_f, rtol=2e-5, atol=2e-6)
