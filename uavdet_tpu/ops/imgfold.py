"""Image-fold: run narrow-channel layers with images stacked on lanes.

The detect pipeline's farthest-from-roofline tail layers are the
ResidualBlock(64) + CNNBlock(128, 3, s2) pair at 320² (PERF.md: ~9.2 ms
in XLA vs ~2.7 ms roofline): XLA lane-pads the 32/64-channel activations
to 128 lanes, so every read/write moves 2-4× the real bytes and the MXU
contracts mostly padding.

Fix (same algebra as the cfg3 stem fold, models/dysoem_simfpn.py): stack
``fold`` images on the channel axis — (B, H, W, C) → (B/fold, H, W,
fold·C) — and give every conv a block-diagonal kernel with the original
kernel in each image block. Each output element's dot product gains only
exact-zero terms, so the result is numerically identical, while
fold=4 × C=64 = 256 lanes is layout-exact: zero padding anywhere in the
section. The fold/unfold relayouts piggyback on transposes the pipeline
pays anyway (pallas_l2's channel-major → NHWC epilogue).

Reference ops being accelerated: BaselineModel.py:25-45 (ResidualBlock)
and :10-22 (CNNBlock) as consumed by the DyYOLO config tokens
["B", 1], [128, 3, 2] (conf/model/dy-yolo.yaml).

Eval-mode only (BN running stats; the detector never trains through
this path).
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def block_diag_kernel(kernel: jnp.ndarray, fold: int) -> jnp.ndarray:
    """(kh, kw, Cin, Cout) → (kh, kw, fold·Cin, fold·Cout) with the
    original kernel in each diagonal image block, zeros elsewhere."""
    if fold == 1:
        return kernel
    kh, kw, ci, co = kernel.shape
    out = jnp.zeros((kh, kw, fold * ci, fold * co), kernel.dtype)
    for g in range(fold):
        out = out.at[:, :, g * ci:(g + 1) * ci,
                     g * co:(g + 1) * co].set(kernel)
    return out


def fold_images(x: jnp.ndarray, fold: int) -> jnp.ndarray:
    """(B, H, W, C) → (B/fold, H, W, fold·C); block g of the channel axis
    holds image ``fold·b + g``."""
    if fold == 1:
        return x
    b, h, w, c = x.shape
    return x.reshape(b // fold, fold, h, w, c).transpose(
        0, 2, 3, 1, 4).reshape(b // fold, h, w, fold * c)


def unfold_images(x: jnp.ndarray, fold: int) -> jnp.ndarray:
    """Inverse of :func:`fold_images`."""
    if fold == 1:
        return x
    bf, h, w, fc = x.shape
    c = fc // fold
    return x.reshape(bf, h, w, fold, c).transpose(
        0, 3, 1, 2, 4).reshape(bf * fold, h, w, c)


def _folded_cnnblock(x, params, stats, fold, stride, pad, dtype):
    """CNNBlock (conv → BN eval → LeakyReLU 0.1) with a block-diagonal
    kernel and fold-tiled BN parameters; mirrors flax numerics
    (models/layers.py::CNNBlock)."""
    k = block_diag_kernel(
        jnp.asarray(params["Conv_0"]["kernel"], jnp.float32), fold)
    y = jax.lax.conv_general_dilated(
        x, k.astype(dtype), window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bnp, bns = params["BatchNorm_0"], stats["BatchNorm_0"]
    tile = lambda v: jnp.tile(jnp.asarray(v, jnp.float32), fold)
    mul = (tile(bnp["scale"])
           * jax.lax.rsqrt(tile(bns["var"]) + 1e-5)).astype(dtype)
    y = (y - tile(bns["mean"]).astype(dtype)) * mul \
        + tile(bnp["bias"]).astype(dtype)
    return jnp.where(y > 0, y, 0.1 * y)


def folded_block_down(xf, rb_params, rb_stats, down_params, down_stats,
                      fold: int, dtype: Any = jnp.bfloat16):
    """ResidualBlock(C, repeats=1) + CNNBlock(2C, 3, s2) on the folded
    layout: (B/fold, H, W, fold·C) → (B/fold, H/2, W/2, fold·2C).

    rb_params/stats: the ResidualBlock subtree (CNNBlock_0 1×1 C→C/2,
    CNNBlock_1 3×3 C/2→C); down_params/stats: the downsample CNNBlock.
    """
    y = _folded_cnnblock(xf, rb_params["CNNBlock_0"],
                         rb_stats["CNNBlock_0"], fold, 1, 0, dtype)
    y = _folded_cnnblock(y, rb_params["CNNBlock_1"],
                         rb_stats["CNNBlock_1"], fold, 1, 1, dtype)
    y = y + xf  # residual skip (use_residual=True for "B" tokens)
    return _folded_cnnblock(y, down_params, down_stats, fold, 2, 1, dtype)
