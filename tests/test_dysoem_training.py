"""DySOEM_SimFPN trains end-to-end with effective scales derived from its
actual feature strides (2/4/8) — the fix for the reference's shipped scale
mismatch (SURVEY §2.3)."""

import numpy as np
import jax

from uavdet_tpu.models import DySOEM_SimFPN
from uavdet_tpu.training import build_optimizer, init_state, make_train_step
from tests.test_train_step import _synthetic_batch, INPUT


class HP:
    # anchors smallest-first: x0 (highest-res) head first
    anchors = [[[6, 5], [10, 6], [13, 8]],
               [[18, 14], [24, 18], [30, 12]],
               [[40, 30], [60, 46], [54, 36]]]
    head_scales = [2, 4, 8]
    lr = 1e-3
    lr_scheduler = False

    class loss_balancing:
        obj_scales_w = [2.0, 1.0, 0.5]
        bbox_w = 4.0
        objectness_w = 1.0
        no_obj_w = 4.0

    bbox_loss_fn = "mse"

    class optim:
        name = "SGD"
        momentum = 0.7


def test_dysoem_trains(rng):
    model = DySOEM_SimFPN()
    tx = build_optimizer(HP)
    state = init_state(model, tx, jax.random.key(0), INPUT, batch_size=2)
    step = make_train_step(model, tx, HP, INPUT)
    batch = _synthetic_batch(rng, batch=2)

    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
