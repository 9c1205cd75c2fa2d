"""Fast small-channel 3x3 convolutions — patchified matmul reformulation.

XLA's TPU convolution pads the contraction dim (in_channels·k) to the
128-lane MXU width, so a 3→32 3x3 conv at 640px costs ~10 ms for 16 images
(~3% MXU util) — it dominates the whole DyYOLO/Baseline stem. These
routines re-express the SAME convolution (exact numerics, autodiff-friendly)
as a dense batched matmul with a large contraction dim:

* stride 1: space-to-depth(4) patches. Output pixels are grouped into 4×4
  phase blocks; every phase needs the same 3·3·I input patch, so the patch
  tensor is (B, H/4, W/4, 16·9·I) and the kernel becomes a block-diagonal
  (16·9·I, 16·O) matrix (16 identical (9I, O) blocks). The MXU happily eats
  the structural zeros — padded FLOPs stay ~1 ms where XLA's conv took 10.
* stride 2: plain im2col at output resolution: patches (B, H/2, W/2, 9·I)
  contracted with (9I, O).

Both accept a per-sample kernel batch dim (the dynamic-convolution case:
kernel (B,3,3,I,O)) — a batched matmul handles per-sample weights natively,
which is exactly what XLA's conv cannot do efficiently (the reference's
``groups=batch_size`` trick, model/_base.py:72-74).

Use ``use_fast_conv3x3`` to decide when the rewrite pays off.
"""

import os
from typing import Optional

import jax.numpy as jnp


def use_fast_conv3x3(in_channels: int, kernel_size, stride) -> bool:
    """Opt-in via UAVDET_FASTCONV=1. Measured on TPU v5e the XLA lowering
    of the patch-building strided slices is currently SLOWER than the
    native conv (the rewrite wins on paper — padded-MXU FLOPs ~10× lower —
    but Mosaic materializes the patch concat badly). Kept for CPU/GPU and
    as the numerical reference for the planned Pallas stem kernel."""
    if os.environ.get("UAVDET_FASTCONV", "0") != "1":
        return False
    k = kernel_size[0] if isinstance(kernel_size, (tuple, list)) \
        else kernel_size
    s = stride[0] if isinstance(stride, (tuple, list)) else stride
    return k == 3 and s in (1, 2) and in_channels <= 32


def _patches_s2(xp: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """im2col for stride-2 3x3: (B, 2H+?, ...) padded input → patches
    (B, out_h, out_w, 9·I); xp must already be spatially padded by 1."""
    cols = [xp[:, ki:ki + 2 * out_h:2, kj:kj + 2 * out_w:2, :]
            for ki in range(3) for kj in range(3)]
    return jnp.concatenate(cols, axis=-1)


def conv3x3_s2_small(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 pad-1 conv via im2col matmul.

    x: (B, H, W, I); kernel: (3,3,I,O) or (B,3,3,I,O). → (B, H/2, W/2, O).
    """
    b, h, w, i = x.shape
    oh, ow = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    p = _patches_s2(xp, oh, ow)  # (B, oh, ow, 9I)
    if kernel.ndim == 4:
        kmat = kernel.reshape(9 * i, -1)
        return jnp.einsum("bhwp,po->bhwo", p, kmat.astype(p.dtype))
    kmat = kernel.reshape(b, 9 * i, -1)
    return jnp.einsum("bhwp,bpo->bhwo", p, kmat.astype(p.dtype))


def conv3x3_s1_small(x: jnp.ndarray, kernel: jnp.ndarray,
                     block: int = 4) -> jnp.ndarray:
    """3x3 stride-1 pad-1 conv via space-to-depth(block) + block-diagonal
    matmul.

    x: (B, H, W, I) with H, W divisible by ``block``;
    kernel: (3,3,I,O) or (B,3,3,I,O). → (B, H, W, O).
    """
    b, h, w, i = x.shape
    o = kernel.shape[-1]
    g = block
    hh, ww = h // g, w // g
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # patch tensor: P[b, r, c, a, bb, t, i] = xp[b, g·r + a + ki, g·c + bb + kj, i]
    # built from 9 shifted views reshaped into phase blocks
    shifts = []
    for ki in range(3):
        for kj in range(3):
            v = xp[:, ki:ki + h, kj:kj + w, :]
            v = v.reshape(b, hh, g, ww, g, i).transpose(0, 1, 3, 2, 4, 5)
            shifts.append(v)  # (B, hh, ww, g, g, I)
    p = jnp.stack(shifts, axis=5)  # (B, hh, ww, g, g, 9, I)
    p = p.reshape(b, hh, ww, g * g * 9 * i)

    # block-diagonal kernel: 16 identical (9I, O) blocks
    per_sample = kernel.ndim == 5
    kmat = kernel.reshape((b, 9 * i, o) if per_sample else (9 * i, o))
    eye = jnp.eye(g * g, dtype=kmat.dtype)
    if per_sample:
        kdiag = jnp.einsum("pq,bko->bpkqo", eye, kmat).reshape(
            b, g * g * 9 * i, g * g * o)
        out = jnp.einsum("bhwp,bpq->bhwq", p, kdiag.astype(p.dtype))
    else:
        kdiag = jnp.einsum("pq,ko->pkqo", eye, kmat).reshape(
            g * g * 9 * i, g * g * o)
        out = jnp.einsum("bhwp,pq->bhwq", p, kdiag.astype(p.dtype))

    # (B, hh, ww, g, g, O) → (B, H, W, O)
    out = out.reshape(b, hh, ww, g, g, o).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(b, h, w, o)


def fast_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                 block: Optional[int] = None) -> jnp.ndarray:
    """Dispatch: stride 1 → s2d-block matmul; stride 2 → im2col matmul."""
    if stride == 1:
        g = block or (4 if x.shape[1] % 4 == 0 else 2)
        if x.shape[1] % g or x.shape[2] % g:
            g = 1
        if g == 1:  # spatial not divisible; fall back unsupported here
            raise ValueError("spatial dims must be divisible by block")
        return conv3x3_s1_small(x, kernel, block=g)
    if stride == 2:
        return conv3x3_s2_small(x, kernel)
    raise ValueError(f"unsupported stride {stride}")
