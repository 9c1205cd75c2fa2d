"""Golden tests for box geometry ops vs hand-computed values and (where
available) torch/torchvision formulas re-derived in numpy."""

import numpy as np
import jax.numpy as jnp
import pytest

from uavdet_tpu.ops.boxes import (
    anchor_iou,
    box_convert,
    box_iou_elementwise,
    box_iou_pairwise,
    complete_box_iou,
    complete_box_iou_loss,
)


def test_box_convert_roundtrip(rng):
    xyxy = rng.uniform(0, 100, size=(17, 4)).astype(np.float32)
    xyxy[:, 2:] = xyxy[:, :2] + np.abs(xyxy[:, 2:]) + 1.0
    for fmt in ["xywh", "cxcywh"]:
        there = box_convert(jnp.asarray(xyxy), "xyxy", fmt)
        back = box_convert(there, fmt, "xyxy")
        np.testing.assert_allclose(np.asarray(back), xyxy, rtol=1e-5, atol=1e-4)


def test_box_convert_golden():
    # xywh (10, 20, 30, 40) -> xyxy (10, 20, 40, 60) -> cxcywh (25, 40, 30, 40)
    b = jnp.array([[10.0, 20.0, 30.0, 40.0]])
    xyxy = box_convert(b, "xywh", "xyxy")
    np.testing.assert_allclose(np.asarray(xyxy), [[10, 20, 40, 60]])
    cxcywh = box_convert(xyxy, "xyxy", "cxcywh")
    np.testing.assert_allclose(np.asarray(cxcywh), [[25, 40, 30, 40]])


def test_iou_golden():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[5.0, 5.0, 15.0, 15.0]])
    # inter = 25, union = 100 + 100 - 25 = 175
    iou = box_iou_elementwise(a, b)
    np.testing.assert_allclose(np.asarray(iou), [25 / 175], rtol=1e-6)

    m = box_iou_pairwise(jnp.concatenate([a, b]), jnp.concatenate([a, b]))
    np.testing.assert_allclose(
        np.asarray(m), [[1.0, 25 / 175], [25 / 175, 1.0]], rtol=1e-6)


def test_iou_disjoint_and_identical():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[5.0, 5.0, 6.0, 6.0]])
    assert float(box_iou_elementwise(a, b)[0]) == 0.0
    assert float(box_iou_elementwise(a, a)[0]) == pytest.approx(1.0)


def _ciou_numpy(b1, b2, eps=1e-7):
    """Independent numpy re-derivation of torchvision complete_box_iou_loss."""
    x1, y1, x2, y2 = b1.T
    x1g, y1g, x2g, y2g = b2.T
    w1, h1, w2, h2 = x2 - x1, y2 - y1, x2g - x1g, y2g - y1g
    inter = (np.minimum(x2, x2g) - np.maximum(x1, x1g)).clip(0) * (
        np.minimum(y2, y2g) - np.maximum(y1, y1g)).clip(0)
    union = w1 * h1 + w2 * h2 - inter
    iou = inter / np.maximum(union, eps)
    cw = np.maximum(x2, x2g) - np.minimum(x1, x1g)
    ch = np.maximum(y2, y2g) - np.minimum(y1, y1g)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((x1 + x2 - x1g - x2g) ** 2 + (y1 + y2 - y1g - y2g) ** 2) / 4
    v = (4 / np.pi**2) * (np.arctan(w2 / np.maximum(h2, eps))
                          - np.arctan(w1 / np.maximum(h1, eps))) ** 2
    alpha = v / np.maximum(1 - iou + v, eps)
    return iou - rho2 / c2 - alpha * v


def test_ciou_matches_numpy_reference(rng):
    b1 = rng.uniform(0, 50, size=(64, 4)).astype(np.float32)
    b1[:, 2:] = b1[:, :2] + rng.uniform(1, 50, size=(64, 2)).astype(np.float32)
    b2 = rng.uniform(0, 50, size=(64, 4)).astype(np.float32)
    b2[:, 2:] = b2[:, :2] + rng.uniform(1, 50, size=(64, 2)).astype(np.float32)

    got = np.asarray(complete_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    want = _ciou_numpy(b1.astype(np.float64), b2.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    loss = complete_box_iou_loss(jnp.asarray(b1), jnp.asarray(b2),
                                 reduction="mean")
    np.testing.assert_allclose(float(loss), np.mean(1 - want), rtol=1e-4)


def test_ciou_identical_boxes_is_zero_loss():
    b = jnp.array([[2.0, 3.0, 10.0, 12.0]])
    loss = complete_box_iou_loss(b, b, reduction="mean")
    assert float(loss) == pytest.approx(0.0, abs=1e-5)


def test_anchor_iou_golden():
    # anchors co-centered w/h IoU (reference dataset/_helper.py:308-330)
    anchors = jnp.array([[4.0, 4.0], [2.0, 2.0], [8.0, 2.0]])
    t = jnp.array([4.0, 4.0])
    iou = anchor_iou(t, anchors)
    # [16/16, 4/16, min(8,4)*min(2,4)=8 / (16+16-8)=24]
    np.testing.assert_allclose(np.asarray(iou), [1.0, 0.25, 8 / 24], rtol=1e-6)
