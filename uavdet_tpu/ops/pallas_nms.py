"""Pallas TPU kernel: greedy NMS suppression.

The XLA version (ops/nms.py) materializes the IoU matrix in HBM and runs
the sequential suppression recurrence as N separate fused updates. This
kernel keeps the whole problem in VMEM: one grid step per image computes
the IoU matrix on the VPU and runs the greedy recurrence in-core, with the
suppressor matrix and the alive vector living in VMEM scratch (Mosaic has
no value-level dynamic_slice, so the per-step row reads go through ref
indexing with ``pl.ds``).

Input boxes MUST be sorted by score descending (callers use lax.top_k,
which sorts) — rank order is the suppression priority. Returns the survivor
mask in sorted order; torchvision tie-breaking semantics are preserved
(strict ``iou > threshold`` suppresses; earlier rank wins).

Padding candidates should be zero-area boxes: they have IoU 0 with
everything, survive, and are masked out by the caller's score threshold.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, alive_ref, supp_ref, state_ref, *, thr: float):
    boxes = boxes_ref[0]  # (N, 4) f32, score-sorted
    n = boxes.shape[0]

    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]   # (N, 1)
    x2, y2 = boxes[:, 2:3], boxes[:, 3:4]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    x1t, y1t = jnp.transpose(x1), jnp.transpose(y1)  # (1, N)
    x2t, y2t = jnp.transpose(x2), jnp.transpose(y2)
    areat = jnp.transpose(area)

    # pairwise IoU (N, N) on the VPU
    inter = (jnp.maximum(jnp.minimum(x2, x2t) - jnp.maximum(x1, x1t), 0.0)
             * jnp.maximum(jnp.minimum(y2, y2t) - jnp.maximum(y1, y1t), 0.0))
    union = area + areat - inter
    iou = inter / jnp.maximum(union, 1e-7)

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # supp[s, v] = 1: suppressor s (ranked above v: s < v) overlaps victim v
    supp_ref[...] = jnp.where((iou > thr) & (row < col), 1.0, 0.0)
    state_ref[...] = jnp.ones((1, n), jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, _):
        state = state_ref[...]
        # dynamic LANE indexing must be 128-aligned on TPU, so the scalar
        # state[i] is extracted with a one-hot reduction instead
        alive_i = jnp.sum(jnp.where(lane == i, state, 0.0))
        kill = supp_ref[pl.ds(i, 1), :]             # (1, N) victims of i
        state_ref[...] = state * (1.0 - kill * alive_i)
        return 0

    jax.lax.fori_loop(0, n, body, 0)
    alive_ref[0] = state_ref[...] > 0.5


@partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_nms_alive(boxes_sorted: jnp.ndarray, iou_threshold: float = 0.5,
                     interpret: bool = False) -> jnp.ndarray:
    """boxes_sorted: (B, N, 4) xyxy, score-descending. → alive (B, N) bool."""
    b, n, _ = boxes_sorted.shape
    alive = pl.pallas_call(
        partial(_nms_kernel, thr=float(iou_threshold)),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, n), jnp.bool_),
        scratch_shapes=[
            pltpu.VMEM((n, n), jnp.float32),   # suppressor matrix
            pltpu.VMEM((1, n), jnp.float32),   # alive state
        ],
        interpret=interpret,
    )(boxes_sorted.astype(jnp.float32))
    return alive[:, 0, :]
