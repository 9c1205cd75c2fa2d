"""Pallas NMS kernel vs the XLA reference implementation (interpret mode on
the CPU test platform; the compiled path is exercised on TPU by bench)."""

import numpy as np
import jax.numpy as jnp

from uavdet_tpu.ops.nms import nms
from uavdet_tpu.ops.pallas_nms import pallas_nms_alive


def _sorted_case(rng, b=3, n=128):
    boxes = rng.uniform(0, 80, size=(b, n, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 40, size=(b, n, 2))
    scores = -np.sort(-rng.uniform(size=(b, n)).astype(np.float32), axis=-1)
    return jnp.asarray(boxes), jnp.asarray(scores)


def test_matches_xla_nms(rng):
    boxes, scores = _sorted_case(rng)
    alive_p = np.asarray(pallas_nms_alive(boxes, 0.5, interpret=True))
    for i in range(boxes.shape[0]):
        _, alive_x, order = nms(boxes[i], scores[i], 0.5)
        # boxes already sorted → order is identity
        np.testing.assert_array_equal(np.asarray(order), np.arange(128))
        np.testing.assert_array_equal(alive_p[i], np.asarray(alive_x))


def test_zero_area_padding_survives_harmlessly(rng):
    boxes, scores = _sorted_case(rng, b=1, n=128)
    boxes = boxes.at[0, 100:].set(0.0)  # padding
    alive = np.asarray(pallas_nms_alive(boxes, 0.5, interpret=True))
    assert alive[0, 100:].all()  # zero-area: IoU 0 with everything


def test_threshold_strictness():
    # IoU exactly 0.6 at threshold 0.6 → NOT suppressed
    boxes = jnp.asarray(
        [[[0, 0, 10, 20], [0, 5, 10, 25]] + [[0, 0, 0, 0]] * 126],
        jnp.float32)
    alive = np.asarray(pallas_nms_alive(boxes, 0.6, interpret=True))
    assert alive[0, 0] and alive[0, 1]
    alive = np.asarray(pallas_nms_alive(boxes, 0.5, interpret=True))
    assert alive[0, 0] and not alive[0, 1]
