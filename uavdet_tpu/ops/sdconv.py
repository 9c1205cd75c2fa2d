"""Space-to-depth phase-decomposed 3x3 convolutions.

EXACT reformulations of small-input-channel 3x3 convs that XLA's TPU conv
handles badly (it pads the in-channel contraction to 128 lanes, so a
3→32 conv at 640px runs at ~3% MXU utilization — see PERF.md):

* stride 2: ``out[r,c] = Σ_{ki,kj} K[ki,kj] · x[2r+ki-1, 2c+kj-1]``.
  Writing rows as 2(r+dr')+a' shows every tap lands in a 2×2 window of the
  space-to-depth(2) transform of x, so the conv equals a 2×2 VALID conv
  over s2d(x) (with one top/left pad) with in-channels 4·I. For I=32 that
  is exactly 128 lanes — full MXU utilization.
* stride 1: the same decomposition over s2d(4) input AND output phases:
  a 3×3 conv over (B, H/4, W/4, 16·I) producing all 16 output phases
  stacked (16·O channels), followed by depth-to-space. For I=3 the
  contraction becomes 48 (2.6× lane padding instead of 42×).

Kernel rearrangement is a tiny host/jit-time scatter; the heavy op is a
single dense conv with a healthy contraction dim. Dynamic (per-sample
expert-mixed) variants stack experts on out-channels and contract with
attn ⊗ I afterwards, as in models/layers.DyConvModule.
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/b, W/b, b·b·C); phase-major channel order
    [(a, bb) row-major] × C."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // b, b, w // b, b, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // b, w // b, b * b * c)


def depth_to_space(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """Inverse of space_to_depth (same phase-major channel order)."""
    n, hh, ww, cc = x.shape
    c = cc // (b * b)
    x = x.reshape(n, hh, ww, b, b, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hh * b, ww * b, c)


@lru_cache(maxsize=32)
def _s2_scatter_indices(i_ch: int, o_ch: int):
    """Index map for the stride-2 kernel rearrangement.

    Returns (dst, src) flat index arrays into K' (2,2,4I,O) and K (3,3,I,O).
    Tap (ki, kj) on output (r, c) reads x[2r+ki-1, 2c+kj-1] =
    s2d[r+dr', c+dc', (a', b')] with 2dr'+a' = ki-1, 2dc'+b' = kj-1.
    With a left/top pad of 1 in s2d space, kernel index = dr'+1 ∈ {0,1}.
    """
    dst, src = [], []
    for ki in range(3):
        dr, a = divmod(ki - 1, 2)
        for kj in range(3):
            dc, b = divmod(kj - 1, 2)
            for i in range(i_ch):
                in_idx = (a * 2 + b) * i_ch + i
                d = ((dr + 1) * 2 + (dc + 1)) * (4 * i_ch) + in_idx
                s = (ki * 3 + kj) * i_ch + i
                dst.append(d)
                src.append(s)
    return np.asarray(dst), np.asarray(src)


def _rearrange_kernel_s2(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,I,O) → (2,2,4I,O) for the stride-2 s2d conv."""
    kh, kw, i, o = kernel.shape
    dst, src = _s2_scatter_indices(i, o)
    flat = kernel.reshape(9 * i, o)
    out = jnp.zeros((2 * 2 * 4 * i, o), kernel.dtype)
    out = out.at[dst].set(flat[src])
    return out.reshape(2, 2, 4 * i, o)


def conv3x3_s2_sd(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 pad-1 conv via the s2d(2) decomposition.

    x: (B, H, W, I) with even H, W; kernel: (3,3,I,O). → (B, H/2, W/2, O).
    """
    import jax
    xs = space_to_depth(x, 2)                     # (B, H/2, W/2, 4I)
    kp = _rearrange_kernel_s2(kernel).astype(x.dtype)
    xs = jnp.pad(xs, ((0, 0), (1, 0), (1, 0), (0, 0)))
    return jax.lax.conv_general_dilated(
        xs, kp, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@lru_cache(maxsize=32)
def _s1_scatter_indices(i_ch: int, o_ch: int, blk: int):
    """Index map for the stride-1 kernel rearrangement over s2d(blk).

    K' (3,3, blk²·I, blk²·O): output phase p=(a,b); tap (ki,kj):
    row u = a + ki - 1 = blk·dr' + a'  (dr' ∈ {-1,0,1} with pad 1)."""
    dst, src = [], []
    cc_in = blk * blk * i_ch
    for a in range(blk):
        for b in range(blk):
            p = a * blk + b
            for ki in range(3):
                dr, ap = divmod(a + ki - 1, blk)
                for kj in range(3):
                    dc, bp = divmod(b + kj - 1, blk)
                    for i in range(i_ch):
                        in_idx = (ap * blk + bp) * i_ch + i
                        krow = ((dr + 1) * 3 + (dc + 1))
                        for o in range(o_ch):
                            dst.append((krow * cc_in + in_idx) * (
                                blk * blk * o_ch) + p * o_ch + o)
                            src.append(((ki * 3 + kj) * i_ch + i) * o_ch + o)
    return np.asarray(dst), np.asarray(src)


def _rearrange_kernel_s1(kernel: jnp.ndarray, blk: int) -> jnp.ndarray:
    """(3,3,I,O) → (3,3, blk²·I, blk²·O) phase-stacked (sparse)."""
    kh, kw, i, o = kernel.shape
    dst, src = _s1_scatter_indices(i, o, blk)
    flat = kernel.reshape(-1)
    out = jnp.zeros((9 * blk * blk * i * blk * blk * o,), kernel.dtype)
    out = out.at[dst].set(flat[src])
    return out.reshape(3, 3, blk * blk * i, blk * blk * o)


def conv3x3_s1_sd(x: jnp.ndarray, kernel: jnp.ndarray,
                  blk: int = 4) -> jnp.ndarray:
    """3x3 stride-1 pad-1 conv via the s2d(blk) phase decomposition.

    x: (B, H, W, I) with H, W divisible by blk; kernel (3,3,I,O).
    → (B, H, W, O)."""
    import jax
    o = kernel.shape[-1]
    xs = space_to_depth(x, blk)                   # (B, H/blk, W/blk, blk²·I)
    kp = _rearrange_kernel_s1(kernel, blk).astype(x.dtype)
    ys = jax.lax.conv_general_dilated(
        xs, kp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return depth_to_space(ys, blk)
