"""Parity of the parity-folded early stage (ops/fold_early) against the
real flax modules it replaces.

The folded kernels embed the original weights with exact zeros, so the
folded path computes the same contractions with extra zero terms —
reassociation-level equal: tight f32 tolerances and near-exact f64."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uavdet_tpu.models.layers import CNNBlock, ResidualBlock
from uavdet_tpu.ops.fold_early import (
    fold_cm,
    fold_early_fast_path,
    fold_nhwc,
    unfold_nhwc,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_fold_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unfold_nhwc(fold_nhwc(x))),
                                  np.asarray(x))
    # quadrant-major layout contract
    xf = fold_nhwc(x)
    np.testing.assert_array_equal(
        np.asarray(xf[:, 1, 2, 5 * 3:5 * 4]),       # q=3 = (ry=1, rx=1)
        np.asarray(x[:, 3, 5, :]))


def test_fold_cm_matches_fold_nhwc(rng):
    """fold_cm on a padded channel-major array == fold_nhwc on the
    sliced NHWC view (the pallas_l2 raw_cm contract: pad is junk rows /
    zero lanes beyond (h, wq))."""
    b, c, h, wq = 2, 6, 8, 10
    cm = rng.normal(size=(b, c, h + 3, 128)).astype(np.float32)
    cm[:, :, :, wq:] = 0.0
    nhwc = jnp.asarray(cm[:, :, :h, :wq]).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(
        np.asarray(fold_cm(jnp.asarray(cm), h, wq)),
        np.asarray(fold_nhwc(nhwc)))


def _make_stage(dtype, c=64, seed=0):
    """ResidualBlock(c) + CNNBlock(2c, 3x3 s2) with real flax init, and
    the folded fast path built from the same variables via a fake tail
    model."""
    from uavdet_tpu.models.dy_yolo import DyYOLO

    rb = ResidualBlock(c, num_repeats=1, dtype=dtype)
    ds = CNNBlock(2 * c, kernel_size=(3, 3), stride=(2, 2), padding=1,
                  dtype=dtype)
    x0 = jnp.zeros((1, 8, 8, c), dtype or jnp.float32)
    v_rb = rb.init(jax.random.key(seed), x0, False)
    v_ds = ds.init(jax.random.key(seed + 1), x0, False)

    tail_model = DyYOLO(layer_config=(("B", 1), (2 * c, 3, 2)),
                        attn_temperature=30.0, n_anchors=3, dtype=dtype)
    tail_vars = {
        "params": {"net": {"ResidualBlock_0": v_rb["params"],
                           "CNNBlock_0": v_ds["params"]}},
        "batch_stats": {"net": {"ResidualBlock_0": v_rb["batch_stats"],
                                "CNNBlock_0": v_ds["batch_stats"]}},
    }

    def ref_fn(x):
        y = rb.apply(v_rb, x, False)
        return ds.apply(v_ds, y, False)

    got = fold_early_fast_path(tail_model, tail_vars)
    assert got is not None
    return ref_fn, got


def test_folded_early_matches_modules_f32(rng):
    ref_fn, (early_fn, _, _) = _make_stage(None)
    x = jnp.asarray(rng.normal(size=(2, 16, 20, 64)).astype(np.float32))
    ref = np.asarray(ref_fn(x), np.float32)
    out = np.asarray(early_fn(fold_nhwc(x)), np.float32)
    assert out.shape == ref.shape == (2, 8, 10, 128)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_folded_early_matches_modules_f64(rng):
    """f64 separates bug from reassociation noise (CLAUDE.md lesson):
    the folded path must match to ~1e-13 where f32 tolerances could
    hide a wrong tap."""
    with jax.enable_x64(True):
        ref_fn, (early_fn, _, _) = _make_stage(jnp.float64)
        x = jnp.asarray(rng.normal(size=(1, 12, 16, 64))).astype(
            jnp.float64)
        ref = np.asarray(ref_fn(x), np.float64)
        out = np.asarray(early_fn(fold_nhwc(x)), np.float64)
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-13)


def test_fold_early_gates_on_tokens():
    from uavdet_tpu.models.dy_yolo import DyYOLO
    tail = DyYOLO(layer_config=((256, 3, 2), ("B", 1)),
                  attn_temperature=30.0, n_anchors=3, dtype=None)
    assert fold_early_fast_path(tail, {"params": {"net": {}},
                                       "batch_stats": {"net": {}}}) is None


def test_full_tail_parity_through_fold(rng):
    """stem-out -> [folded early -> tail2] == [tail] on the real DyYOLO
    config (rekey correctness incl. S/U tokens downstream)."""
    from uavdet_tpu.models import build_model
    from uavdet_tpu.ops.pallas_stem_split import detector_stem_fast_path
    from uavdet_tpu.utils.config import load_params

    cfg = load_params("params.yaml")
    model = build_model(cfg.model.name, cfg.model.hparams)
    S = 64
    x0 = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = model.init(jax.random.key(2), x0, train=False)
    stem_fn, tail_model, tail_vars = detector_stem_fast_path(
        model, variables, model.layer_config,
        getattr(model, "attn_temperature", 30.0))
    early_fn, tail2, tail2_vars = fold_early_fast_path(
        tail_model, tail_vars)

    xstem = jnp.asarray(
        rng.normal(size=(2, S // 2, S // 2, 64)).astype(np.float32))
    ref = tail_model.apply(tail_vars, xstem, train=False)
    out = tail2.apply(tail2_vars, early_fn(fold_nhwc(xstem)),
                      train=False)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32),
                                   rtol=2e-4, atol=2e-5)
