"""Parity-folded early stage: B1 @H/2 + the 128-s2 downsample on a
space-to-depth (2x2 -> channels) layout.

Why (r4 per-section roofline, PERF.md round-4): the `early` section
measures at XLA's LANE-PADDED cost — its 32/64-channel @320 maps occupy
full 128-lane tiles, moving 2-4x their real bytes. Folding 2x2 space
into channels makes every early activation >=128 channels (zero lane
padding). The price is block-structured kernels run dense:

  1x1 c->c/2      -> (1,1,4c,2c) block-diagonal (4x dense FLOPs, but the
                     1x1's MXU time is negligible against its HBM time)
  3x3 s1 c/2->c   -> (3,3,2c,4c), 9/36-dense: output parity (ry,rx) at
                     folded (i,j) is the original conv at (2i+ry,2j+rx);
                     folded offset f and input parity p reach original
                     offset d = 2f+p-r which must lie in {-1,0,1}
  3x3 s2 c->2c    -> (2,2,4c,2c) with padding ((1,0),(1,0)), 9/16-dense:
                     the stride-2 output IS the un-folded @H/4 frame, so
                     the downsample exits the folded layout for free

All folded kernels embed the ORIGINAL weights with exact zeros
elsewhere — the arithmetic is the same contractions plus zero terms
(reassociation-level equal; parity-tested at f64 in
tests/test_fold_early.py).

This transform was measured IN CONTEXT on the real chip (r4): see
PERF.md for the verdict and scripts/fold_early_probe.py for the
harness. The r3 `imgfold` rejection (PERF.md round-2 "what lost") was a
different fold — 4 images stacked on lanes with 4x-FLOP block-diagonal
3x3s at full @320 resolution; this one works at @160 with 16/9x FLOPs
on the one 3x3 that matters.

Reference op being re-designed: the reference's early backbone is plain
NCHW torch convs (reference model/BaselineModel.py:25-45); lane padding
is a TPU-only concern, so this module has no reference counterpart.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def fold_nhwc(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), quadrant-major channels:
    out[..., C*(2*ry+rx) + c] = x[:, 2i+ry, 2j+rx, c]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def fold_cm(x_cm, h: int, wq: int):
    """Channel-major (B, C, Hp, WB) (pallas_l2 raw_cm output; rows past
    ``h`` and lanes past ``wq`` are pad) -> folded NHWC
    (B, h/2, wq/2, 4C). One transpose — replaces the raw_cm -> NHWC
    transpose the unfolded path pays, so the fold relayout is free."""
    b, c, _, _ = x_cm.shape
    x = x_cm[:, :, :h, :wq].reshape(b, c, h // 2, 2, wq // 2, 2)
    return x.transpose(0, 2, 4, 3, 5, 1).reshape(b, h // 2, wq // 2, 4 * c)


def unfold_nhwc(xf):
    """Inverse of fold_nhwc."""
    b, hq, wq, c4 = xf.shape
    c = c4 // 4
    x = xf.reshape(b, hq, wq, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * hq, 2 * wq, c)


def fold_kernel_1x1(k):
    """(1,1,ci,co) -> (1,1,4ci,4co) block-diagonal."""
    _, _, ci, co = k.shape
    kf = jnp.zeros((1, 1, 4 * ci, 4 * co), k.dtype)
    for q in range(4):
        kf = kf.at[0, 0, ci * q:ci * (q + 1),
                   co * q:co * (q + 1)].set(k[0, 0])
    return kf


def fold_kernel_3x3_s1(k):
    """(3,3,ci,co) -> (3,3,4ci,4co), SAME padding in folded space.

    Folded offset f in {-1,0,1}, input parity p, output parity r:
    original offset d = 2f + p - r; block nonzero iff d in {-1,0,1}."""
    _, _, ci, co = k.shape
    kf = jnp.zeros((3, 3, 4 * ci, 4 * co), k.dtype)
    for ry in range(2):
        for rx in range(2):
            qo = 2 * ry + rx
            for py in range(2):
                for px in range(2):
                    qi = 2 * py + px
                    for fy in (-1, 0, 1):
                        dy = 2 * fy + py - ry
                        if not -1 <= dy <= 1:
                            continue
                        for fx in (-1, 0, 1):
                            dx = 2 * fx + px - rx
                            if not -1 <= dx <= 1:
                                continue
                            kf = kf.at[
                                fy + 1, fx + 1,
                                ci * qi:ci * (qi + 1),
                                co * qo:co * (qo + 1)].set(
                                    k[dy + 1, dx + 1])
    return kf


def fold_kernel_3x3_s2(k):
    """(3,3,ci,co) stride-2 -> (2,2,4ci,co) stride-1 with padding
    ((1,0),(1,0)) on the folded input; the output is the ordinary
    un-folded @H/4 map.

    Folded tap d in {0,1} reads folded row i-1+d = original row
    2(i-1+d)+p; original offset = 2d - 2 + p, nonzero iff in {-1,0,1}
    (the (d=0, p=0) block is exactly zero)."""
    _, _, ci, co = k.shape
    kf = jnp.zeros((2, 2, 4 * ci, co), k.dtype)
    for py in range(2):
        for px in range(2):
            qi = 2 * py + px
            for dy in range(2):
                oy = 2 * dy - 2 + py
                if not -1 <= oy <= 1:
                    continue
                for dx in range(2):
                    ox = 2 * dx - 2 + px
                    if not -1 <= ox <= 1:
                        continue
                    kf = kf.at[dy, dx, ci * qi:ci * (qi + 1), :].set(
                        k[oy + 1, ox + 1])
    return kf


def _conv(x, k, padding):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn_leaky(x, p, s, eps=1e-5, tile=4, dtype=None):
    """BatchNorm (inference) + leaky_relu(0.1) with channel params tiled
    ``tile``x for the folded layout (quadrant-major: plain jnp.tile).

    Mirrors flax ``_normalize`` EXACTLY: ``rsqrt(var+eps)*scale`` is
    computed at the STORED stat/param dtype (f32 under the default
    param_dtype, even in an f64 run) and promoted only at the multiply
    with x, then the result is cast to flax's canonicalized output
    dtype. Computing the rsqrt at x.dtype instead differs at the f32
    ULP — which the f64 parity test resolves (measured ~1e-7 rel)."""
    from flax.linen import dtypes as _fld

    def t(v):
        return jnp.tile(v, tile) if tile > 1 else v

    y = x - t(s["mean"])
    mul = jax.lax.rsqrt(t(s["var"]) + eps) * t(p["scale"])
    y = y * mul + t(p["bias"])
    y = jnp.asarray(y, _fld.canonicalize_dtype(x, p["scale"], p["bias"],
                                               dtype=dtype))
    return jax.nn.leaky_relu(y, negative_slope=0.1)


def fold_early_fast_path(tail_model, tail_variables):
    """Consume the tail's leading [B,1] + [128,3,2] tokens into a
    folded-layout function.

    Returns (early_fn, tail2_model, tail2_variables) where
    ``early_fn(x_folded)`` maps the FOLDED stem output
    (B, H/2, W/2, 4*64) to the ordinary (B, H/4, W/4, 128) map and
    tail2 runs the remaining tokens — or None if the tail doesn't start
    with those tokens. Module indices in the remaining tree shift by
    the consumed counts (1 ResidualBlock, 1 CNNBlock)."""
    cfg = [list(t) for t in tail_model.layer_config]
    if len(cfg) < 2 or cfg[0] != ["B", 1] or list(cfg[1]) != [128, 3, 2]:
        return None

    p = tail_variables["params"]["net"]
    s = tail_variables["batch_stats"]["net"]
    rb_p, rb_s = p["ResidualBlock_0"], s["ResidualBlock_0"]
    ds_p, ds_s = p["CNNBlock_0"], s["CNNBlock_0"]

    def kern(blk):
        # keep the STORED dtype (no f32 floor): an f64 run must fold f64
        # weights or the f64 parity contract silently degrades to f32
        return np.asarray(blk["Conv_0"]["kernel"])

    k1f = fold_kernel_1x1(kern(rb_p["CNNBlock_0"]))      # (1,1,256,128)
    k3f = fold_kernel_3x3_s1(kern(rb_p["CNNBlock_1"]))   # (3,3,128,256)
    k2f = fold_kernel_3x3_s2(kern(ds_p))                 # (2,2,256,128)
    bn1p, bn1s = rb_p["CNNBlock_0"]["BatchNorm_0"], \
        rb_s["CNNBlock_0"]["BatchNorm_0"]
    bn3p, bn3s = rb_p["CNNBlock_1"]["BatchNorm_0"], \
        rb_s["CNNBlock_1"]["BatchNorm_0"]
    bn2p, bn2s = ds_p["BatchNorm_0"], ds_s["BatchNorm_0"]

    dtype = tail_model.dtype or jnp.float32

    mdt = tail_model.dtype  # flax canonicalization target (None = infer)

    def early_fn(xf):
        xf = xf.astype(dtype)
        y = _conv(xf, k1f, "VALID")                       # 1x1 -> 128
        y = _bn_leaky(y, bn1p, bn1s, dtype=mdt)
        y = _conv(y, k3f, "SAME")                         # 3x3 -> 256
        y = _bn_leaky(y, bn3p, bn3s, dtype=mdt)
        xf = xf + y                                       # residual
        y = _conv(xf, k2f, ((1, 0), (1, 0)))              # s2 -> @H/4
        return _bn_leaky(y, bn2p, bn2s, tile=1, dtype=mdt)

    def rekey(tree):
        out = {}
        for k, v in tree.items():
            for pref, n in (("ResidualBlock_", 1), ("CNNBlock_", 1)):
                if k.startswith(pref):
                    out[f"{pref}{int(k.split('_')[-1]) - n}"] = v
                    break
            else:
                out[k] = v
        return out

    tail2_variables = {
        "params": {"net": rekey({k: v for k, v in p.items()
                                 if k not in ("ResidualBlock_0",
                                              "CNNBlock_0")})},
        "batch_stats": {"net": rekey({k: v for k, v in s.items()
                                      if k not in ("ResidualBlock_0",
                                                   "CNNBlock_0")})},
    }
    tail2_model = type(tail_model)(
        layer_config=tuple(tuple(t) for t in cfg[2:]),
        attn_temperature=tail_model.attn_temperature,
        n_anchors=tail_model.n_anchors, dtype=tail_model.dtype)
    return early_fn, tail2_model, tail2_variables
