"""YOLO target encoding — vectorized, on-device, jittable.

Re-designs the reference's per-sample host-side encoder
(dataset/AntiUAVDataset.py:141-185), which runs in 32 dataloader worker
processes, as a dense scatter that runs inside the jitted train step. The
semantics are preserved exactly:

For each box and each detection head (reference :155-181):
  * the box center picks one grid cell; offsets are the fractional parts;
    width/height are expressed in grid units (``w * S``),
  * anchor assignment by w/h-only IoU (dataset/_helper.py:308-330):
      - if the best anchor IoU < 0.5 → assign only the best anchor (obj=1),
      - else → every anchor gets the coords; obj=1 iff its IoU ≥ 0.5
        (anchors below threshold still receive coords but obj stays 0).

Padding boxes (mask=False) write nothing. Multiple boxes scatter
sequentially, so a later box overwrites an earlier one landing in the same
cell — identical to the reference's python loop ordering.
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .boxes import anchor_iou, box_convert


def head_sizes(input_size: int, head_scales: Sequence[int]) -> Tuple[int, ...]:
    """Grid size per head: ``input_size // scale`` (reference
    AntiUAVDataset.py:28)."""
    return tuple(input_size // s for s in head_scales)


def _encode_one_head(boxes_cxcywh: jnp.ndarray, mask: jnp.ndarray,
                     anchors: jnp.ndarray, size: int) -> jnp.ndarray:
    """Encode all boxes of ONE image into ONE head's dense grid.

    boxes_cxcywh: (N, 4) normalized [0,1] cxcywh.
    mask:         (N,) bool validity.
    anchors:      (A, 2) normalized anchor w/h for this head.
    → (A, size, size, 5) grid [obj, off_cx, off_cy, grid_w, grid_h].
    """
    n_anchors = anchors.shape[0]
    grid = jnp.zeros((n_anchors, size, size, 5), dtype=boxes_cxcywh.dtype)
    arange_a = jnp.arange(n_anchors)

    def body(i, grid):
        cx, cy, w, h = (boxes_cxcywh[i, k] for k in range(4))
        gcx, gcy = cx * size, cy * size
        gx = jnp.clip(gcx.astype(jnp.int32), 0, size - 1)
        gy = jnp.clip(gcy.astype(jnp.int32), 0, size - 1)
        coords = jnp.stack(
            [gcx - gx, gcy - gy, w * size, h * size])  # (4,)

        ious = anchor_iou(jnp.stack([w, h]), anchors)  # (A,)
        best = jnp.argmax(ious)
        best_iou = ious[best]
        is_best = arange_a == best

        write = ((best_iou >= 0.5) | is_best) & mask[i]
        obj = jnp.where(ious >= 0.5, 1.0,
                        jnp.where(is_best & (best_iou < 0.5), 1.0, 0.0)
                        ).astype(grid.dtype)
        vals = jnp.concatenate(
            [obj[:, None], jnp.broadcast_to(coords, (n_anchors, 4))], axis=-1)

        old = grid[:, gy, gx, :]
        new = jnp.where(write[:, None], vals, old)
        return grid.at[:, gy, gx, :].set(new)

    return jax.lax.fori_loop(0, boxes_cxcywh.shape[0], body, grid)


def validate_targets(grids, head_sizes_: Sequence[int]) -> None:
    """Host-side sanity net over encoded grids — the TPU equivalent of the
    reference's inline assertion test (utils/test.py:3-14): head count,
    objectness ∈ [0,1], no NaN/Inf. Use in debug paths, not inside jit."""
    import numpy as np

    assert len(grids) == len(head_sizes_), (
        "Number of scaled targets not match with detection heads")
    for i, g in enumerate(grids):
        a = np.asarray(g)
        obj = a[..., 0]
        assert ((obj >= 0) & (obj <= 1)).all(), (
            f"Scale bbox {i} has invalid objectness values")
        assert not np.isnan(a).any(), f"Scale bbox {i} contains NaN values"
        assert not np.isinf(a).any(), f"Scale bbox {i} contains Inf values"


def encode_yolo_targets(boxes_xyxy: jnp.ndarray, box_mask: jnp.ndarray,
                        anchors: jnp.ndarray,
                        head_scales: Sequence[int],
                        input_size: int) -> Tuple[jnp.ndarray, ...]:
    """Encode a batch of normalized xyxy boxes into per-head dense grids.

    boxes_xyxy: (B, N, 4) normalized [0,1] xyxy.
    box_mask:   (B, N) bool.
    anchors:    (H, A, 2) anchor priors in PIXELS (config layout,
                reference params.yaml:38-56); normalized here by
                ``input_size`` exactly as AntiUAVDataset.py:27.
    → tuple of H arrays (B, A, S_h, S_h, 5).

    Encoding dtype follows the boxes, floored at float32 — f64 boxes
    produce f64 grids (exact-parity test paths), anything lower-precision
    is raised to the reference's f32.
    """
    dtype = jnp.promote_types(jnp.asarray(boxes_xyxy).dtype, jnp.float32)
    anchors = jnp.asarray(anchors).astype(dtype) / input_size
    boxes_cxcywh = box_convert(jnp.asarray(boxes_xyxy).astype(dtype),
                               "xyxy", "cxcywh")
    sizes = head_sizes(input_size, head_scales)

    out = []
    for h, size in enumerate(sizes):
        enc = jax.vmap(_encode_one_head, in_axes=(0, 0, None, None))
        out.append(enc(boxes_cxcywh, box_mask, anchors[h], size))
    return tuple(out)
