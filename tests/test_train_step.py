"""End-to-end slice: jitted train step on a synthetic dataset — loss must
decrease (SURVEY §7 minimum end-to-end milestone)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uavdet_tpu.models import DyYOLO
from uavdet_tpu.training import build_optimizer, cyclic_triangular2, \
    init_state, make_train_step, make_eval_step
from uavdet_tpu.utils.datatypes import BatchData
from tests.test_models import TINY_DY_CONFIG

INPUT = 64


class HP:
    anchors = [[[40, 30], [60, 46], [54, 36]],
               [[18, 14], [24, 18], [30, 12]],
               [[6, 5], [10, 6], [13, 8]]]
    head_scales = [16, 8, 4]
    lr = 1e-2
    lr_scheduler = False
    attn_temperature = 30.0

    class loss_balancing:
        obj_scales_w = [0.5, 1.0, 2.0]
        bbox_w = 4.0
        objectness_w = 1.0
        no_obj_w = 4.0

    bbox_loss_fn = "mse"

    class optim:
        name = "SGD"
        momentum = 0.78


def _synthetic_batch(rng, batch=4):
    imgs = rng.uniform(size=(batch, INPUT, INPUT, 3)).astype(np.float32)
    boxes = np.zeros((batch, 1, 4), np.float32)
    for b in range(batch):
        wh = rng.uniform(8, 24, size=2)
        cxy = rng.uniform(wh / 2 + 1, INPUT - wh / 2 - 1)
        boxes[b, 0] = [cxy[0] - wh[0] / 2, cxy[1] - wh[1] / 2,
                       cxy[0] + wh[0] / 2, cxy[1] + wh[1] / 2]
        # paint the object into the image so there is signal to learn
        x1, y1, x2, y2 = boxes[b, 0].astype(int)
        imgs[b, y1:y2, x1:x2, :] = 1.0
    return BatchData(image=jnp.asarray(imgs),
                     boxes=jnp.asarray(boxes / INPUT),
                     box_mask=jnp.ones((batch, 1), bool))


def test_train_loss_decreases(rng):
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    tx = build_optimizer(HP)
    state = init_state(model, tx, jax.random.key(0), INPUT, batch_size=4)
    step = make_train_step(model, tx, HP, INPUT)

    batch = _synthetic_batch(rng)
    _, first = step(state, batch)
    losses = []
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < float(first["loss"]) * 0.7, losses[-5:]


def test_remat_step_matches_plain(rng):
    """jax.checkpoint rematerialization must not change the math: one step
    with remat (full and dots_saveable policy) produces the same loss and
    parameters as the plain step."""
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    tx = build_optimizer(HP)
    batch = _synthetic_batch(rng)
    results = []
    for remat in (False, True, "dots_saveable"):
        state = init_state(model, tx, jax.random.key(0), INPUT,
                           batch_size=4)
        step = make_train_step(model, tx, HP, INPUT, remat=remat)
        state, m = step(state, batch)
        results.append((float(m["loss"]),
                        np.asarray(jax.tree.leaves(state.params)[0])))
    # Semantic exactness was verified in float64 (gradients bit-identical
    # with and without jax.checkpoint). In f32, remat's different op
    # fusion/association surfaces as noise amplified by cancellation in
    # the attention-GAP gradients — loss to ~1e-4 rel, params to ~2e-3
    # abs after one SGD step.
    for loss, leaf in results[1:]:
        assert loss == pytest.approx(results[0][0], rel=1e-4)
        np.testing.assert_allclose(leaf, results[0][1], atol=5e-3)


def test_eval_step_runs(rng):
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    tx = build_optimizer(HP)
    state = init_state(model, tx, jax.random.key(0), INPUT, batch_size=2)
    ev = make_eval_step(model, HP, INPUT)
    m = ev(state, _synthetic_batch(rng, batch=2))
    assert np.isfinite(float(m["loss"]))


def test_grad_accumulation_semantics(rng):
    """MultiSteps(2): params frozen after the first micro-batch; two
    identical micro-batches produce exactly one plain step's update
    (identical grads → their average is the same gradient).

    (Half-vs-full-batch equivalence does NOT hold with BatchNorm in train
    mode — micro-batch statistics differ — so identical micro-batches are
    the exact-equivalence case.)"""

    class HP2(HP):
        lr = 1e-2

        class optim:
            name = "SGD"
            momentum = 0.0

    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    half = _synthetic_batch(rng, batch=2)

    # accumulated path: same micro-batch twice
    tx_acc = build_optimizer(HP2, grad_batches=2)
    st = init_state(model, tx_acc, jax.random.key(0), INPUT, batch_size=2)
    p0 = jax.tree.map(np.asarray, st.params)
    step_acc = make_train_step(model, tx_acc, HP2, INPUT)
    st, _ = step_acc(st, half)
    # params unchanged after first micro-step
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(st.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    st, _ = step_acc(st, half)

    # plain path: one step on the same batch
    tx_full = build_optimizer(HP2)
    st2 = init_state(model, tx_full, jax.random.key(0), INPUT, batch_size=2)
    step_full = make_train_step(model, tx_full, HP2, INPUT)
    st2, _ = step_full(st2, half)

    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_cyclic_triangular2_schedule():
    sched = cyclic_triangular2(1e-5, 1e-4, step_size_up=4000)
    assert float(sched(0)) == pytest.approx(1e-5)
    assert float(sched(4000)) == pytest.approx(1e-4)
    assert float(sched(8000)) == pytest.approx(1e-5)
    # second cycle: amplitude halved
    assert float(sched(12000)) == pytest.approx(1e-5 + (1e-4 - 1e-5) / 2)
