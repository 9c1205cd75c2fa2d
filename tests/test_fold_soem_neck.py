"""Parity of the row-folded DySOEM level-0 path (ops/fold_soem_neck)
against the stock folded-stem forward.

Every folded kernel embeds the original weights with exact zeros (the
s2d experts conv exit carries NO extra taps at all), BN params tile
parity-exactly at inference, and the head outputs unfold to the stock
layout — reassociation-level equal: tight f32, near-exact f64
(CLAUDE.md bug-vs-noise discriminator)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uavdet_tpu.models.dysoem_simfpn import DySOEM_SimFPN, fold_input_stem
from uavdet_tpu.ops.fold_soem_neck import fold_soem_neck_forward


@pytest.fixture
def rng():
    return np.random.default_rng(21)


def _setup(dtype, size=32, seed=0):
    model = DySOEM_SimFPN(dtype=dtype)
    x0 = jnp.zeros((1, size, size, 3), dtype or jnp.float32)
    variables = model.init(jax.random.key(seed), x0, train=False)
    if dtype == jnp.float64:
        variables = jax.tree.map(
            lambda v: v.astype(jnp.float64)
            if jnp.issubdtype(v.dtype, jnp.floating) else v, variables)
    return model, variables


def _stock(model, variables, x, dtype):
    front = fold_input_stem(variables, dtype=dtype or jnp.float32)
    return model.clone(stem_folded=True).apply(variables, front(x),
                                               train=False)


@pytest.mark.parametrize("size", [32, 64])
@pytest.mark.parametrize("dtype,rtol,atol", [
    (None, 1e-3, 5e-4),
    (jnp.float64, 1e-10, 1e-12),
])
def test_rowfold_matches_stock(rng, size, dtype, rtol, atol):
    with jax.enable_x64(dtype is not None):
        model, variables = _setup(dtype, size)
        fn = fold_soem_neck_forward(model, variables)
        assert fn is not None
        x = jnp.asarray(rng.normal(size=(2, size, size, 3)),
                        dtype or jnp.float32)
        ref = _stock(model, variables, x, dtype)
        out = fn(x)
        for o, r in zip(out, ref):
            assert o.obj.shape == r.obj.shape
            assert o.bbox.shape == r.bbox.shape
            np.testing.assert_allclose(np.asarray(o.obj, np.float64),
                                       np.asarray(r.obj, np.float64),
                                       rtol=rtol, atol=atol)
            np.testing.assert_allclose(np.asarray(o.bbox, np.float64),
                                       np.asarray(r.bbox, np.float64),
                                       rtol=rtol, atol=atol)


def test_uint8_matches_float(rng):
    """uint8 frames fold /255 into the front kernel (linearity)."""
    model, variables = _setup(None)
    fn = fold_soem_neck_forward(model, variables)
    u8 = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
    out_u8 = fn(jnp.asarray(u8))
    out_f = fn(jnp.asarray(u8.astype(np.float32) / 255.0))
    for a, b in zip(out_u8, out_f):
        np.testing.assert_allclose(np.asarray(a.obj), np.asarray(b.obj),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(a.bbox), np.asarray(b.bbox),
                                   rtol=2e-5, atol=2e-6)


def test_gates():
    """Folded/stock-mismatched models return None; odd sizes raise."""
    model, variables = _setup(None)
    assert fold_soem_neck_forward(
        model.clone(stem_folded=True), variables) is None
    assert fold_soem_neck_forward(
        model.clone(s2d_conv=False), variables) is None
    fn = fold_soem_neck_forward(model, variables)
    with pytest.raises(ValueError, match="input_size"):
        fn(jnp.zeros((1, 30, 30, 3)))


@pytest.mark.parametrize("size", [32, 64])
def test_dyconv_path_matches_rowfold(rng, size):
    """The per-sample mixed-kernel Pallas path (dyconv=True, interpret
    mode on CPU) matches the pure-XLA row-fold path at bf16 tolerance —
    the parity-block reshape/permutation and the fused BN epilogue are
    the things under test (the kernel itself is parity-tested in
    test_pallas_dyconv.py)."""
    model = DySOEM_SimFPN(dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init(jax.random.key(3), x0, train=False)
    fn_dy = fold_soem_neck_forward(model, variables, dyconv=True,
                                   dyconv_interpret=True)
    fn_rf = fold_soem_neck_forward(model, variables, dyconv=False)
    assert fn_dy is not None and fn_rf is not None
    x = jnp.asarray(rng.integers(0, 256, size=(2, size, size, 3),
                                 dtype=np.uint8))
    for a, b in zip(fn_dy(x), fn_rf(x)):
        np.testing.assert_allclose(np.asarray(a.obj, np.float32),
                                   np.asarray(b.obj, np.float32),
                                   rtol=0.05, atol=0.05)
        np.testing.assert_allclose(np.asarray(a.bbox, np.float32),
                                   np.asarray(b.bbox, np.float32),
                                   rtol=0.05, atol=0.05)


def test_detector_uses_rowfold(rng):
    """make_detector end-to-end through the row-folded path produces
    detections close to the stock-path detector (reassociation-level
    scores; same candidate layout by construction)."""
    from uavdet_tpu.inference import make_detector

    class HP:
        anchors = [[[40, 30], [60, 46], [54, 36]],
                   [[18, 14], [24, 18], [30, 12]],
                   [[6, 5], [10, 6], [13, 8]]]

        @staticmethod
        def get(name, default=None):
            return getattr(HP, name, default)

    model, variables = _setup(None, size=32)
    det_fold = make_detector(model, HP, 32, compute_dtype=jnp.float32,
                             pallas_stem_variables=variables)
    det_stock = make_detector(model, HP, 32, compute_dtype=jnp.float32,
                              pallas_stem_variables=None)
    u8 = jnp.asarray(rng.integers(0, 256, size=(2, 32, 32, 3),
                                  dtype=np.uint8))
    a = det_fold(variables, u8)
    b = det_stock(variables, u8)
    # same valid set and close boxes/scores (random-weight logits are
    # spread out, so the top-k set is stable under 1e-5-level noise)
    assert np.asarray(a.valid).sum() == np.asarray(b.valid).sum()
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.boxes), np.asarray(b.boxes),
                               rtol=1e-3, atol=5e-3)
