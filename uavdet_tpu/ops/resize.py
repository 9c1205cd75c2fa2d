"""Bilinear resize as separable matmuls (MXU form).

``jax.image.resize(method='bilinear')`` lowers to gathers on TPU —
measured 4.3 ms for 8×1080p→640² on v5e against a ~0.5 ms traffic
roofline, and the gather also serializes against downstream convs.
The (antialiased) bilinear kernel is separable and touches ≤5 input
rows/cols per output, so the exact same resize is two small matmuls
against precomputed weight matrices: 1.9 ms standalone, and it
pipelines (PERF.md r3: cfg2 440 → 511 fps).

Numerics replicate jax.image.resize: the 1/scale-widened triangle
kernel on downscale (antialias=True, jax's default), plain 2-tap
lerp on upscale, and jax's drop-out-of-range-taps + renormalize edge
handling — verified to ≤1.8e-7 (downscale) / 1.8e-5 (upscale) at
f32-highest precision (tests/test_inference.py).
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def resize_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_in, n_out) f32 separable-resize matrix for one axis."""
    scale = n_out / n_in
    kscale = min(scale, 1.0)
    out = np.zeros((n_in, n_out), np.float64)
    idx = np.arange(n_in)
    for o in range(n_out):
        c = (o + 0.5) / scale - 0.5
        w = np.maximum(0.0, 1.0 - np.abs((idx - c) * kscale))
        s = w.sum()
        out[:, o] = w / s if s > 0 else 0.0
    return out.astype(np.float32)


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """(B, H, W, C) → (B, out_h, out_w, C), dtype preserved.

    The einsums accumulate in f32 (preferred_element_type) and the
    result is cast back to ``x.dtype`` once, matching flax/XLA's usual
    bf16-compute/f32-accumulate convention.
    """
    dt = x.dtype
    b, h, w, c = x.shape
    y = x
    if h != out_h:
        y = jnp.einsum("bhwc,hH->bHwc", y,
                       jnp.asarray(resize_weights(h, out_h), dt),
                       preferred_element_type=jnp.float32).astype(dt)
    if w != out_w:
        y = jnp.einsum("bhwc,wW->bhWc", y,
                       jnp.asarray(resize_weights(w, out_w), dt),
                       preferred_element_type=jnp.float32).astype(dt)
    return y
