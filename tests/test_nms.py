"""NMS parity vs an independent numpy greedy reference (torchvision
semantics: strict > threshold suppresses; ties broken by input order)."""

import numpy as np
import jax.numpy as jnp

from uavdet_tpu.ops.nms import batched_nms, nms


def _nms_numpy(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if not alive[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = (x2 - x1).clip(0) * (y2 - y1).clip(0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area_i + areas - inter, 1e-7)
        alive &= ~(iou > thr)
        alive[i] = False  # already kept
    return np.array(keep, np.int32)


def test_nms_golden():
    boxes = jnp.array([
        [0, 0, 10, 10],    # score .9  kept
        [1, 1, 11, 11],    # score .8  suppressed by box 0 (iou ~ .68)
        [20, 20, 30, 30],  # score .7  kept
        [0, 0, 10, 10],    # score .6  suppressed (iou 1.0 with box 0)
    ], jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    keep, alive, order = nms(boxes, scores, 0.5)
    kept = [int(k) for k in keep if int(k) >= 0]
    assert kept == [0, 2]


def test_nms_threshold_is_strict():
    # two boxes with IoU exactly 0.5: NOT suppressed at threshold 0.5
    boxes = jnp.array([[0, 0, 10, 20], [0, 10, 10, 25.0]])
    # iou = 0 here; craft exact 0.5: [0,0,10,20] vs [0,5,10,25]:
    boxes = jnp.array([[0, 0, 10, 20], [0, 5, 10, 25.0]])
    # inter = 10*15=150, union=200+200-150=250 → iou=0.6 > 0.5 suppressed
    scores = jnp.array([0.9, 0.8])
    keep, _, _ = nms(boxes, scores, 0.5)
    assert [int(k) for k in keep if int(k) >= 0] == [0]
    keep, _, _ = nms(boxes, scores, 0.6)  # iou==0.6 NOT > 0.6 → both kept
    assert [int(k) for k in keep if int(k) >= 0] == [0, 1]


def test_nms_random_parity(rng):
    n = 128
    boxes = rng.uniform(0, 80, size=(n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, size=(n, 2))
    scores = rng.uniform(size=n).astype(np.float32)
    keep, _, _ = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    got = [int(k) for k in keep if int(k) >= 0]
    want = _nms_numpy(boxes, scores, 0.5).tolist()
    assert got == want


def test_nms_padding_ignored(rng):
    n = 16
    boxes = np.zeros((n, 4), np.float32)
    scores = np.full(n, -np.inf, np.float32)
    boxes[0] = [0, 0, 10, 10]
    scores[0] = 0.9
    keep, _, _ = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    assert [int(k) for k in keep if int(k) >= 0] == [0]


def test_batched_nms(rng):
    b, n = 4, 64
    boxes = rng.uniform(0, 80, size=(b, n, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 40, size=(b, n, 2))
    scores = rng.uniform(size=(b, n)).astype(np.float32)
    keep, alive, order = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_keep=32)
    for i in range(b):
        got = [int(k) for k in keep[i] if int(k) >= 0]
        want = _nms_numpy(boxes[i], scores[i], 0.5).tolist()[:32]
        assert got == want[:len(got)] and len(got) == min(len(want), 32)
