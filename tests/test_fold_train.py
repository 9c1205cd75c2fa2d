"""Parity of the TRAINABLE parity-folded early stage
(ops/fold_early.fold_early_train_apply) against the stock train-mode
forward: outputs, gradients, and BatchNorm batch statistics.

The fold embeds the original kernels with exact zeros and the batch
statistics reduce the identical element population (quadrant-group-
first), so everything is reassociation-level equal — near-exact at f64
(the repo's bug-vs-noise discriminator, CLAUDE.md), tight at f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uavdet_tpu.models import DyYOLO
from uavdet_tpu.ops.fold_early import fold_early_train_apply
from tests.test_models import TINY_DY_CONFIG

INPUT = 64


def _stock_apply(model, variables, x):
    outs, mut = model.apply(variables, x, train=True,
                            mutable=["batch_stats"])
    return outs, mut["batch_stats"]


def _loss(outs):
    return sum(jnp.sum(jnp.square(o.obj.astype(jnp.float64)))
               + jnp.sum(jnp.square(o.bbox.astype(jnp.float64)))
               for o in outs)


def _tree_close(a, b, **tol):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64), **tol)


@pytest.mark.parametrize("dtype,rtol,atol", [
    # f32: pure reassociation noise (measured max abs ~5e-5 on O(1)
    # outputs; the relative column only trips on near-zero elements) —
    # the f64 row is the bug-vs-noise discriminator (CLAUDE.md lesson)
    (None, 1e-3, 5e-4),
    (jnp.float64, 1e-11, 1e-12),
])
def test_folded_train_matches_stock(rng, dtype, rtol, atol):
    with jax.enable_x64(dtype is not None):
        model = DyYOLO(layer_config=TINY_DY_CONFIG, dtype=dtype)
        x0 = jnp.zeros((2, INPUT, INPUT, 3), dtype or jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, x0,
                               train=True)
        if dtype is not None:
            variables = jax.tree.map(
                lambda v: v.astype(jnp.float64)
                if jnp.issubdtype(v.dtype, jnp.floating) else v, variables)
        folded = fold_early_train_apply(model)
        assert folded is not None

        x = jnp.asarray(rng.normal(size=(2, INPUT, INPUT, 3)),
                        dtype or jnp.float32)

        outs_ref, stats_ref = _stock_apply(model, variables, x)
        outs_f, stats_f = folded(variables, x)

        _tree_close(outs_f, outs_ref, rtol=rtol, atol=atol)
        _tree_close(stats_f, stats_ref, rtol=rtol, atol=atol)

        # gradients w.r.t. the ORIGINAL parameter tree
        def g_ref(p):
            outs, _ = _stock_apply(
                model, {"params": p,
                        "batch_stats": variables["batch_stats"]}, x)
            return _loss(outs)

        def g_fold(p):
            outs, _ = folded({"params": p,
                              "batch_stats": variables["batch_stats"]}, x)
            return _loss(outs)

        gr = jax.grad(g_ref)(variables["params"])
        gf = jax.grad(g_fold)(variables["params"])
        # identical tree structure: every original param gets a gradient
        assert jax.tree.structure(gr) == jax.tree.structure(gf)
        _tree_close(gf, gr, rtol=rtol * 50, atol=atol * 50)


def test_folded_train_step_trajectory(rng):
    """Five SGD steps through make_train_step(fold_early=True) track the
    stock step at f64 (f32 trajectories amplify reassociation noise
    chaotically — ~2% by step 5, measured — so only f64 discriminates;
    model dtype must be f64, not just x64 mode: CLAUDE.md lesson)."""
    import optax

    from uavdet_tpu.training import init_state, make_train_step
    from uavdet_tpu.utils.datatypes import BatchData

    class HP:
        anchors = [[[40, 30], [60, 46], [54, 36]],
                   [[18, 14], [24, 18], [30, 12]],
                   [[6, 5], [10, 6], [13, 8]]]
        head_scales = [16, 8, 4]
        attn_temperature = 30.0

        class loss_balancing:
            obj_scales_w = [0.5, 1.0, 2.0]
            bbox_w = 4.0
            objectness_w = 1.0
            no_obj_w = 4.0

        bbox_loss_fn = "mse"

    with jax.enable_x64(True):
        model = DyYOLO(layer_config=TINY_DY_CONFIG, dtype=jnp.float64)
        tx = optax.sgd(1e-2)
        imgs = rng.uniform(size=(2, INPUT, INPUT, 3))
        batch = BatchData(image=jnp.asarray(imgs, jnp.float64),
                          boxes=jnp.asarray(
                              np.asarray([[[0.4, 0.4, 0.6, 0.6]]] * 2),
                              dtype=jnp.float64),
                          box_mask=jnp.ones((2, 1), bool))

        losses = {}
        for fold in (False, True):
            state = init_state(model, tx, jax.random.key(0), INPUT,
                               batch_size=2)
            state = jax.tree.map(
                lambda v: v.astype(jnp.float64)
                if hasattr(v, "dtype")
                and jnp.issubdtype(v.dtype, jnp.floating) else v, state)
            step = make_train_step(model, tx, HP, INPUT,
                                   compute_dtype=jnp.float64,
                                   fold_early=fold)
            ls = []
            for _ in range(5):
                state, m = step(state, batch)
                ls.append(float(m["loss"]))
            losses[fold] = ls
        np.testing.assert_allclose(losses[True], losses[False], rtol=1e-9)


def test_fold_early_train_apply_gates_on_config():
    """Configs without the [B,1]+[C,3,2] tokens at [2:4] return None."""
    model = DyYOLO(layer_config=(("DyConv", 8, 3, 1), (16, 3, 2),
                                 (32, 3, 2), ("B", 1)))
    assert fold_early_train_apply(model) is None
