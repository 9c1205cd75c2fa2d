"""Pallas TPU kernel: greedy NMS suppression.

The XLA version (ops/nms.py) materializes the IoU matrix in HBM and runs
the sequential suppression recurrence as N separate fused updates. This
kernel keeps the whole problem in VMEM: one grid step per image computes
the IoU matrix on the VPU and runs the greedy recurrence in-core.

Input boxes MUST be sorted by score descending (callers use lax.top_k,
which sorts) — rank order is the suppression priority. Returns the
survivor mask in sorted order; torchvision tie-breaking semantics are
preserved (strict ``iou > threshold`` suppresses; earlier rank wins).

Padding candidates should be zero-area boxes: they have IoU 0 with
everything, survive, and are masked out by the caller's score threshold.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, alive_ref, *, thr: float, interpret: bool):
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
    # supp[s, v]: suppressor s (ranked above v: s < v) overlaps victim v
    supp = (iou > thr) & (row < col)

    def body(i, alive):
        alive_i = jax.lax.dynamic_slice(alive, (0, i), (1, 1))
        kill = jax.lax.dynamic_slice(supp, (i, 0), (1, n))  # victims of i
        return alive & ~(kill & alive_i)

    alive = jnp.ones((1, n), dtype=jnp.bool_)
    alive = jax.lax.fori_loop(0, n, body, alive)
    alive_ref[0] = alive


@partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_nms_alive(boxes_sorted: jnp.ndarray, iou_threshold: float = 0.5,
                     interpret: bool = False) -> jnp.ndarray:
    """boxes_sorted: (B, N, 4) xyxy, score-descending. → alive (B, N) bool."""
    b, n, _ = boxes_sorted.shape
    alive = pl.pallas_call(
        partial(_nms_kernel, thr=float(iou_threshold), interpret=interpret),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, n), jnp.bool_),
        interpret=interpret,
    )(boxes_sorted.astype(jnp.float32))
    return alive[:, 0, :]
