"""Pytree datatypes.

Mirrors the reference's NamedTuple contracts (`utils/datatype.py:4-11` in the
reference): ``DetectionResults(bbox, obj)`` per detection head and
``BatchData(image, bbox)`` per batch — re-expressed as JAX pytrees with static
shapes so they flow through jit/vmap/shard_map.

Differences from the reference, by design:
  * ``BatchData.bbox`` in the reference is a python list of per-head dense
    target tensors built on the host by 32 dataloader workers. Here the batch
    carries *raw padded boxes* (``boxes``: (B, MAX_BOXES, 4) xyxy-pixel,
    ``box_mask``: (B, MAX_BOXES) bool) and the dense YOLO grid targets are
    encoded **on device inside the jitted step** (see ops/targets.py). A
    ``Targets`` pytree holds the per-head dense grids once encoded.
  * Everything is a NamedTuple → automatically a pytree; no registration
    needed.
"""

from typing import NamedTuple, Tuple, Any

import jax.numpy as jnp


class DetectionResults(NamedTuple):
    """Raw per-head predictions.

    bbox: (B, A, H, W, 4) box logits  (reference model/_base.py:102-120)
    obj:  (B, A, H, W, 1) objectness logits (reference model/_base.py:80-99)
    """

    bbox: jnp.ndarray
    obj: jnp.ndarray


class BatchData(NamedTuple):
    """One training batch.

    image:    (B, H, W, C) float32/bfloat16 in [0, 1], NHWC (TPU-native
              layout; the reference uses NCHW).
    boxes:    (B, N, 4) float32, xyxy in *normalized* [0,1] image coords.
    box_mask: (B, N) bool — True for real boxes, False for padding.
    """

    image: jnp.ndarray
    boxes: jnp.ndarray
    box_mask: jnp.ndarray


class Targets(NamedTuple):
    """Dense per-head YOLO grid targets, one entry per detection head.

    Each element: (B, A, S, S, 5) with [obj, off_cx, off_cy, grid_w, grid_h]
    exactly matching the reference encoder's layout
    (dataset/AntiUAVDataset.py:141-185).
    """

    grids: Tuple[jnp.ndarray, ...]


class TrainState(NamedTuple):
    """Functional train state threaded through the jitted train step."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
