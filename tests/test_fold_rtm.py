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


@pytest.mark.parametrize("size", [15, 17])
@pytest.mark.parametrize("dtype,rtol,atol", [
    (None, 1e-3, 5e-4),          # f32: reassociation noise envelope
    (jnp.float64, 1e-10, 1e-11),  # f64: the bug-vs-noise discriminator
])
def test_train_fold_matches_stock(rng, size, dtype, rtol, atol):
    """TRAIN-mode fold (fold_rtm_train_apply, VERDICT r4 item 6):
    outputs, updated BatchNorm batch statistics, and gradients w.r.t.
    the ORIGINAL parameter tree all

    match ``model.apply(train=True)`` — incl. the masked quadrant-group
    statistics at odd stem extents (size 15 → hs 7)."""
    from uavdet_tpu.ops.fold_rtm import fold_rtm_train_apply

    with jax.enable_x64(dtype is not None):
        full = RTMUAVDet(anchors=ANCHORS, det_scales=(4, 2), dtype=dtype)
        x0 = jnp.zeros((2, size, size, 3), dtype or jnp.float32)
        variables = full.init({"params": jax.random.key(0)}, x0)
        if dtype is not None:
            variables = jax.tree.map(
                lambda v: v.astype(jnp.float64)
                if jnp.issubdtype(v.dtype, jnp.floating) else v, variables)
        folded = fold_rtm_train_apply(full)
        assert folded is not None
        assert fold_rtm_train_apply(
            RTMUAVDet(anchors=ANCHORS, stem_folded=True)) is None

        x = jnp.asarray(rng.normal(size=(2, size, size, 3)),
                        dtype or jnp.float32)
        rngs = {"dropout": jax.random.key(3)}

        ref, mut = full.apply(variables, x, train=True,
                              mutable=["batch_stats"], rngs=rngs)
        out, stats = folded(variables, x, rngs=rngs)

        _assert_outs_close(out, ref, rtol=rtol, atol=atol)
        # complete batch_stats tree (same structure), values matching
        assert (jax.tree.structure(dict(mut["batch_stats"]))
                == jax.tree.structure(jax.tree.map(lambda v: v, stats)))
        for a, b in zip(jax.tree.leaves(mut["batch_stats"]),
                        jax.tree.leaves(stats)):
            np.testing.assert_allclose(np.asarray(b, np.float64),
                                       np.asarray(a, np.float64),
                                       rtol=rtol, atol=atol)

        def loss_ref(p):
            outs, _ = full.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"], rngs=rngs)
            return sum(jnp.sum(jnp.square(o.bbox.astype(jnp.float64)))
                       + jnp.sum(jnp.square(o.obj.astype(jnp.float64)))
                       for o in outs)

        def loss_fold(p):
            outs, _ = folded({"params": p,
                              "batch_stats": variables["batch_stats"]},
                             x, rngs=rngs)
            return sum(jnp.sum(jnp.square(o.bbox.astype(jnp.float64)))
                       + jnp.sum(jnp.square(o.obj.astype(jnp.float64)))
                       for o in outs)

        gr = jax.grad(loss_ref)(variables["params"])
        gf = jax.grad(loss_fold)(variables["params"])
        assert jax.tree.structure(gr) == jax.tree.structure(gf)
        for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
            a = np.asarray(a, np.float64)
            # f32 grads of this quadratic probe loss reach O(1e4) with
            # near-cancelling sums — scale atol to the leaf magnitude
            # (measured stray: 2/73k elements at abs 0.07 on a 3.7e4
            # leaf); the f64 row is the bug-vs-noise discriminator
            np.testing.assert_allclose(
                np.asarray(b, np.float64), a, rtol=rtol * 50,
                atol=max(atol * 50,
                         float(np.abs(a).max()) * rtol * 50))


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
