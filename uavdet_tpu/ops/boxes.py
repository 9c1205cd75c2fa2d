"""Box geometry ops — pure, jittable, static-shape.

TPU-native replacements for the torchvision ops the reference leans on:
  * ``box_convert``            (used at reference dataset/AntiUAVDataset.py:134,148,
                                model/_base.py:246, utils/metrics.py:31-32)
  * ``box_iou``                (utils/postprocess.py:80)
  * ``complete_box_iou_loss``  (utils/metrics.py:35)
  * anchor w/h IoU             (dataset/_helper.py:308-330)

Everything works on arbitrarily batched leading dims; last dim is 4.
"""

import jax
import jax.numpy as jnp

_EPS = 1e-7


def box_convert(boxes: jnp.ndarray, in_fmt: str, out_fmt: str) -> jnp.ndarray:
    """Convert between 'xyxy', 'xywh' (top-left + size) and 'cxcywh'."""
    if in_fmt == out_fmt:
        return boxes
    a, b, c, d = (boxes[..., i] for i in range(4))
    # normalize to xyxy
    if in_fmt == "xyxy":
        x1, y1, x2, y2 = a, b, c, d
    elif in_fmt == "xywh":
        x1, y1, x2, y2 = a, b, a + c, b + d
    elif in_fmt == "cxcywh":
        x1, y1, x2, y2 = a - c / 2, b - d / 2, a + c / 2, b + d / 2
    else:
        raise ValueError(f"unknown in_fmt {in_fmt}")

    if out_fmt == "xyxy":
        out = (x1, y1, x2, y2)
    elif out_fmt == "xywh":
        out = (x1, y1, x2 - x1, y2 - y1)
    elif out_fmt == "cxcywh":
        out = ((x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1)
    else:
        raise ValueError(f"unknown out_fmt {out_fmt}")
    return jnp.stack(out, axis=-1)


def _area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0) * jnp.clip(
        boxes[..., 3] - boxes[..., 1], 0)


def box_iou_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix (N, M) for xyxy boxes — torchvision ``box_iou``."""
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = _area(boxes1)[..., :, None] + _area(boxes2)[..., None, :] - inter
    return inter / jnp.maximum(union, _EPS)


def box_iou_elementwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU over matching leading dims, xyxy format."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = _area(boxes1) + _area(boxes2) - inter
    return inter / jnp.maximum(union, _EPS)


def complete_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                     eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise Complete IoU (CIoU) for xyxy boxes.

    Matches torchvision ``complete_box_iou_loss`` internals (Zheng et al.
    2019): CIoU = IoU - rho2/c2 - alpha*v.
    """
    iou = box_iou_elementwise(boxes1, boxes2)

    # smallest enclosing box diagonal
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    whc = rb - lt
    c2 = whc[..., 0] ** 2 + whc[..., 1] ** 2 + eps

    # center distance
    c1 = (boxes1[..., :2] + boxes1[..., 2:]) / 2
    c2_ = (boxes2[..., :2] + boxes2[..., 2:]) / 2
    rho2 = jnp.sum((c1 - c2_) ** 2, axis=-1)

    # aspect-ratio consistency
    w1 = boxes1[..., 2] - boxes1[..., 0]
    h1 = boxes1[..., 3] - boxes1[..., 1]
    w2 = boxes2[..., 2] - boxes2[..., 0]
    h2 = boxes2[..., 3] - boxes2[..., 1]
    v = (4 / (jnp.pi ** 2)) * (
        jnp.arctan(w2 / jnp.maximum(h2, eps))
        - jnp.arctan(w1 / jnp.maximum(h1, eps))) ** 2
    alpha = jax.lax.stop_gradient(v / jnp.maximum(1 - iou + v, eps))

    return iou - rho2 / c2 - alpha * v


def complete_box_iou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                          reduction: str = "none") -> jnp.ndarray:
    """1 - CIoU, matching torchvision's reduction semantics."""
    loss = 1.0 - complete_box_iou(boxes1, boxes2)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def anchor_iou(target_wh: jnp.ndarray, anchors_wh: jnp.ndarray) -> jnp.ndarray:
    """Width/height-only IoU between a target box and anchor priors.

    Reference ``calculate_anchor_iou`` (dataset/_helper.py:308-330): boxes are
    treated as co-centered, intersection = min(w)·min(h).

    target_wh: (..., 2); anchors_wh: (A, 2) → (..., A)
    """
    tw, th = target_wh[..., None, 0], target_wh[..., None, 1]
    aw, ah = anchors_wh[..., 0], anchors_wh[..., 1]
    inter = jnp.minimum(aw, tw) * jnp.minimum(ah, th)
    union = aw * ah + tw * th - inter
    return inter / jnp.maximum(union, _EPS)
