"""YOLO loss engine — dense, masked, fully vectorized.

Replaces the reference's python-level ``batch_size × n_heads`` loop
(model/_base.py:155-212) with one fused masked computation per head. The
numerics reproduce the reference exactly:

per sample i, per head h (reference :163-192):
  bbox  += bbox_w  * bbox_loss(decoded[pos], built_target[pos])    # masked MEAN
  obj   += objectness_w * obj_scales_w[h] * BCE(p_obj[pos], iou * t_obj[pos])
  obj   += no_obj_w * BCE(p_obj[~pos], t_obj[~pos])
totals are summed over heads and samples, then divided by batch_size.

The masked means are per-(sample, head) — positive-cell counts differ per
sample, so plain global means would NOT match; we reduce with per-sample
mask sums instead.

IoU soft labels (utils/postprocess.py:48-82): IoU between the decoded
prediction (w/h scaled by grid-unit anchors in 'mse' mode) and a grid
target, with gradients stopped (the reference uses ``.detach().clone()``).

DELIBERATE DEVIATION (``iou_mode``): the reference's ``calculate_iou``
returns ``ious[:, 0]`` — every positive prediction's IoU against the
FIRST positive target of that (sample, head) in (A, S, S) flatten order
(utils/postprocess.py:80-82) — almost certainly an indexing bug (the
diagonal was intended). Default ``iou_mode='elementwise'`` pairs each
positive prediction with ITS OWN cell's target; the two agree whenever a
(sample, head) has exactly one positive cell, and differ under
multi-anchor assignment. ``iou_mode='col0'`` reproduces the reference's
exact semantics for reference-loss parity protocols (PARITY.md
'col-0 quirk').
"""

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from .boxes import box_convert, box_iou_elementwise, complete_box_iou
from .decode import add_grid_offsets, decode_predictions, normalize_target_wh


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy on logits (numerically stable,
    same formula as torch F.binary_cross_entropy_with_logits)."""
    return (jnp.clip(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


class LossBreakdown(NamedTuple):
    total: jnp.ndarray
    bbox: jnp.ndarray
    obj: jnp.ndarray


def _masked_mean_per_sample(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over all non-batch dims where mask, per sample → (B,).

    x: (B, ...); mask broadcastable to x. Guarded against empty masks
    (count clamped to 1 — the reference guarantees ≥1 positive cell per
    sample per head via the best-anchor fallback)."""
    axes = tuple(range(1, x.ndim))
    num = jnp.sum(jnp.where(mask, x, 0.0), axis=axes)
    den = jnp.sum(jnp.broadcast_to(mask, x.shape).astype(x.dtype), axis=axes)
    return num / jnp.maximum(den, 1.0)


def yolo_loss(
    outs: Sequence,  # list of DetectionResults-like (bbox, obj) per head
    target_grids: Sequence[jnp.ndarray],  # (B, A, S, S, 5) per head
    anchors: jnp.ndarray,  # (H, A, 2) in pixels
    head_scales: Sequence[int],
    obj_scales_w: Sequence[float],
    bbox_w: float,
    objectness_w: float,
    no_obj_w: float,
    bbox_loss_fn: str = "mse",
    iou_mode: str = "elementwise",
) -> LossBreakdown:
    """Compute the total YOLO loss for all heads; mirrors
    ``YOLOHead.compute_metrics`` (reference model/_base.py:155-212).

    ``iou_mode``: 'elementwise' (default — each positive cell's soft label
    is its own IoU) or 'col0' (reference-exact: IoU against the first
    positive target of the sample/head; see module docstring).

    Compute dtype follows the predictions, floored at float32 (bf16 heads
    still reduce in f32 — matching the reference's f32 loss); f64 inputs
    keep the whole loss in f64 (the parallelism parity tests rely on
    this — only f64 separates schedule bugs from reassociation noise)."""
    dtype = jnp.promote_types(outs[0].obj.dtype, jnp.float32)
    anchors = jnp.asarray(anchors).astype(dtype)
    batch = outs[0].obj.shape[0]
    bbox_losses = jnp.zeros((batch,), dtype)
    obj_losses = jnp.zeros((batch,), dtype)

    for h, (out, grid) in enumerate(zip(outs, target_grids)):
        scaled_anchors = anchors[h] / head_scales[h]  # (A, 2) grid units

        p_bbox = out.bbox.astype(dtype)  # (B, A, S, S, 4)
        p_obj = out.obj.astype(dtype)[..., 0]  # (B, A, S, S)
        grid = jnp.asarray(grid).astype(dtype)
        t_obj = grid[..., 0]
        t_bbox_raw = grid[..., 1:5]
        pos = t_obj == 1.0

        decoded = decode_predictions(p_bbox, scaled_anchors, bbox_loss_fn)

        # --- IoU soft labels (stop-grad) --------------------------------
        iou_pred = jax.lax.stop_gradient(decoded)
        if bbox_loss_fn == "mse":
            # scale w/h into grid units before IoU
            # (reference utils/postprocess.py:65-66)
            wh = iou_pred[..., 2:] * scaled_anchors[:, None, None, :]
            iou_pred = jnp.concatenate([iou_pred[..., :2], wh], axis=-1)
        target_for_iou = t_bbox_raw
        if iou_mode == "col0":
            # reference-exact: IoU of every positive pred against the FIRST
            # positive target in (A,S,S) flatten order (postprocess.py:82)
            bsz = t_obj.shape[0]
            idx0 = jnp.argmax(pos.reshape(bsz, -1), axis=1)
            t0 = jnp.take_along_axis(
                t_bbox_raw.reshape(bsz, -1, 4), idx0[:, None, None], axis=1)
            target_for_iou = jnp.broadcast_to(
                t0[:, 0][:, None, None, None, :], t_bbox_raw.shape)
        ious = box_iou_elementwise(
            box_convert(iou_pred, "cxcywh", "xyxy"),
            box_convert(target_for_iou, "cxcywh", "xyxy"))

        # --- build training target --------------------------------------
        if bbox_loss_fn == "mse":
            t_built = normalize_target_wh(t_bbox_raw, scaled_anchors)
        else:
            t_built = add_grid_offsets(t_bbox_raw)

        # --- bbox loss (masked mean per sample) --------------------------
        if bbox_loss_fn == "mse":
            sq = (decoded - t_built) ** 2  # (B, A, S, S, 4)
            per_sample = _masked_mean_per_sample(sq, pos[..., None])
        else:
            ciou_l = 1.0 - complete_box_iou(
                box_convert(decoded, "cxcywh", "xyxy"),
                box_convert(t_built, "cxcywh", "xyxy"))
            per_sample = _masked_mean_per_sample(ciou_l, pos)
        bbox_losses = bbox_losses + bbox_w * per_sample

        # --- objectness loss ---------------------------------------------
        soft = jax.lax.stop_gradient(ious) * t_obj
        bce = bce_with_logits(p_obj, soft)
        obj_losses = obj_losses + (
            objectness_w * obj_scales_w[h]
            * _masked_mean_per_sample(bce, pos))

        bce_neg = bce_with_logits(p_obj, t_obj)  # t_obj == 0 on ~pos
        obj_losses = obj_losses + no_obj_w * _masked_mean_per_sample(
            bce_neg, ~pos)

    bbox_total = jnp.mean(bbox_losses)
    obj_total = jnp.mean(obj_losses)
    return LossBreakdown(total=bbox_total + obj_total,
                         bbox=bbox_total, obj=obj_total)
