"""Prediction decoding — YOLOv4/v5 parametrization.

Reference ``YOLOHead.__pred_bbox_decoding`` (model/_base.py:214-241):
    cx = sigmoid(t) * 2 - 0.5          (grid-cell offset)
    w  = (sigmoid(t) * 2) ** 2         (anchor-relative size)
and, in 'ciou' mode only, absolute grid coords are added and sizes are
multiplied by the per-head anchors.
"""

import jax
import jax.numpy as jnp


def decode_predictions(pred_bbox: jnp.ndarray, scaled_anchors: jnp.ndarray,
                       bbox_loss_fn: str = "mse") -> jnp.ndarray:
    """Decode raw box logits.

    pred_bbox:      (..., A, H, W, 4) logits.
    scaled_anchors: (A, 2) anchors in grid units (pixels / head_scale).
    → decoded (..., A, H, W, 4) cxcywh in grid units ('ciou') or
      cell-relative offsets ('mse').
    """
    s = jax.nn.sigmoid(pred_bbox)
    pcx = s[..., 0] * 2.0 - 0.5
    pcy = s[..., 1] * 2.0 - 0.5
    pw = (s[..., 2] * 2.0) ** 2
    ph = (s[..., 3] * 2.0) ** 2

    if bbox_loss_fn == "ciou":
        h, w = pred_bbox.shape[-3], pred_bbox.shape[-2]
        grid_x = jax.lax.broadcasted_iota(pred_bbox.dtype, (h, w), 1)
        grid_y = jax.lax.broadcasted_iota(pred_bbox.dtype, (h, w), 0)
        pcx = pcx + grid_x
        pcy = pcy + grid_y
        pw = pw * scaled_anchors[:, 0][..., :, None, None]
        ph = ph * scaled_anchors[:, 1][..., :, None, None]

    return jnp.stack([pcx, pcy, pw, ph], axis=-1)


def add_grid_offsets(t_bbox: jnp.ndarray) -> jnp.ndarray:
    """'ciou'-mode target transform: add absolute grid coordinates to the
    cell-relative cx/cy (reference __build_target_bbox, model/_base.py:259-267)."""
    h, w = t_bbox.shape[-3], t_bbox.shape[-2]
    grid_x = jax.lax.broadcasted_iota(t_bbox.dtype, (h, w), 1)
    grid_y = jax.lax.broadcasted_iota(t_bbox.dtype, (h, w), 0)
    return jnp.stack(
        [t_bbox[..., 0] + grid_x, t_bbox[..., 1] + grid_y,
         t_bbox[..., 2], t_bbox[..., 3]], axis=-1)


def normalize_target_wh(t_bbox: jnp.ndarray,
                        scaled_anchors: jnp.ndarray) -> jnp.ndarray:
    """'mse'-mode target transform (reference model/_base.py:253-257):
    wh' = sqrt((1e-16 + wh) / anchor) / 2 — the inverse of the
    (sigmoid*2)^2 * anchor decode."""
    anchors = scaled_anchors[:, None, None, :]  # (A,1,1,2)
    wh = jnp.sqrt((1e-16 + t_bbox[..., 2:]) / anchors) / 2.0
    return jnp.concatenate([t_bbox[..., :2], wh], axis=-1)
