"""Parity-folded RTM front: StemLayer + MDyCSP_1.base_conv on a 2x2
space-to-depth layout — the RTM analogue of ops/fold_early.

Why: RTMUAVDet's stem emits a 32-channel @H/2 map (319x319 at 640px
input). 32 channels occupy a quarter of a 128-lane tile, so XLA moves
4x the map's real bytes writing it and 4x again when MDyCSP_1's
base_conv reads it — the largest single lane-padding tax left in the
cfg4 program (PERF.md round-4). The fold computes the stem's output
directly in a 2x2-space-into-channels layout (4*32 = 128 channels,
zero padding) and lets the base_conv — conveniently a 3x3 stride-2 —
EXIT the folded layout for free via ops.fold_early.fold_kernel_3x3_s2,
exactly as the DyYOLO fold does.

The folded stem is ONE stride-4 conv: folded cell (i, j) quadrant
(ry, rx) is the original stride-2 conv output at (2i+ry, 2j+rx), whose
5x5 window starts at input row 4i + 2ry - 1 — all four quadrants'
windows lie inside rows 4i-1 .. 4i+5, so a (7, 7, 3, 4*32) stride-4
kernel with the ORIGINAL 5x5 weights embedded at offset (2ry, 2rx) in
quadrant block q = 2ry+rx (exact zeros elsewhere) computes all four in
one pass over the input. (A first cut ran four separate phase convs —
measured 567 fps vs 681 unfolded: each conv re-read the whole input,
4x the stem's input traffic. The single-kernel form reads it once;
stem MXU time is negligible either way.) Odd stem heights (640 -> 319)
put a zero row in the last fold pair: the (ry=1) quadrants' final row
is masked to zero, which the folded-s2 base conv then consumes exactly
like the original conv's zero padding (its last window row taps
original row Hs, a pad row, either way).

EVAL-ONLY (BatchNorm statistics fold per-phase only in inference);
exactness is reassociation-level, f64-parity-tested in
tests/test_fold_rtm.py.

Reference op being re-designed: reference model/RTMUAVDet.py:28-35
(StemLayer) + :37-45 (CSP base conv) — plain NCHW torch convs there;
lane padding is a TPU-only concern, so this module has no reference
counterpart.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .fold_early import fold_kernel_3x3_s2


def _bn_silu(x, p, s, eps, tile=1, dtype=None):
    """flax BatchNorm (inference) + SiLU with channel params tiled
    ``tile``x (quadrant-major). Mirrors flax ``_normalize`` exactly:
    the rsqrt/scale product is computed at the STORED param dtype and
    promoted only at the multiply with x (see ops/fold_early._bn_leaky)."""
    from flax.linen import dtypes as _fld

    def t(v):
        return jnp.tile(v, tile) if tile > 1 else v

    y = x - t(s["mean"])
    mul = jax.lax.rsqrt(t(s["var"]) + eps) * t(p["scale"])
    y = y * mul + t(p["bias"])
    y = jnp.asarray(y, _fld.canonicalize_dtype(x, p["scale"], p["bias"],
                                               dtype=dtype))
    return jax.nn.silu(y)


def _fold_pad(length: int, out: int, k: int = 7, s: int = 4):
    """(lo, hi) padding so the stride-``s`` window-``k`` folded-stem
    conv over ``length`` rows yields ``out`` rows, with window ``i``
    anchored at original row ``s*i - 1`` (lo = 1)."""
    lo = 1
    hi = max(0, s * (out - 1) + k - lo - length)
    got = (length + lo + hi - k) // s + 1
    if got != out:
        raise ValueError(f"fold pad failed: {got} != {out}")
    return lo, hi


def _fold_stem_kernel(k5, c_out_blocks=4):
    """(5,5,ci,co) stride-2 -> (7,7,ci,4co) stride-4: quadrant block
    q = 2ry+rx holds the original kernel at offset (2ry, 2rx)."""
    kk, _, ci, co = k5.shape
    k7 = np.zeros((kk + 2, kk + 2, ci, 4 * co), k5.dtype)
    for ry in (0, 1):
        for rx in (0, 1):
            q = 2 * ry + rx
            k7[2 * ry:2 * ry + kk, 2 * rx:2 * rx + kk, :,
               q * co:(q + 1) * co] = k5
    return k7


def fold_rtm_front(variables, dtype: Any = jnp.float32):
    """-> ``front(x) -> (B, H4, W4, 64)``: raw frames (uint8 or float)
    to MDyCSP_1.base_conv's output, with the 32-ch @H/2 stem map never
    materializing un-folded. Feed the result to
    ``RTMUAVDet(stem_folded=True)``.

    uint8 input carries the /255 preprocess folded into the stem kernel
    (conv is linear in its input), like the Pallas stem fast path.
    """
    stem_p = variables["params"]["stem"]["RTMConvModule_0"]
    stem_s = variables["batch_stats"]["stem"]["RTMConvModule_0"]
    base_p = variables["params"]["MDyCSP_1"]["base_conv"]
    base_s = variables["batch_stats"]["MDyCSP_1"]["base_conv"]

    # keep the STORED dtype (no f32 floor): an f64 run must fold f64
    # weights or the f64 parity contract silently degrades to f32
    k_stem = _fold_stem_kernel(
        np.asarray(stem_p["Conv_0"]["kernel"]))           # (7,7,3,128)
    k_base = fold_kernel_3x3_s2(
        jnp.asarray(base_p["Conv_0"]["kernel"]))          # (2,2,128,64)
    c_stem = k_stem.shape[-1] // 4

    def front(x):
        if x.dtype == jnp.uint8:
            kern = jnp.asarray(k_stem / np.float32(255.0), dtype)
            x = x.astype(dtype)
        else:
            kern = jnp.asarray(k_stem, x.dtype)
        b, h, w, _ = x.shape
        hs, ws = (h - 3) // 2 + 1, (w - 3) // 2 + 1     # stem out (pad 1)
        h4, w4 = (hs - 1) // 2 + 1, (ws - 1) // 2 + 1   # base out (pad 1)

        y = jax.lax.conv_general_dilated(
            x, kern, window_strides=(4, 4),
            padding=(_fold_pad(h, h4), _fold_pad(w, w4)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B,H4,W4,4*32)
        y = _bn_silu(y, stem_p["BatchNorm_0"], stem_s["BatchNorm_0"],
                     eps=1e-3, tile=4, dtype=dtype)
        # Odd stem extent: the last fold pair's second row/col is the
        # base conv's zero-PAD row (s2d of the activation zero-padded to
        # even extent), not a stem output. The phase conv computed
        # garbage there and BN+SiLU maps even exact zeros to
        # silu(bias - mean*mul), so the pad lanes are re-zeroed HERE,
        # after the stem epilogue — matching the unfolded base conv,
        # whose padding zeros enter after the stem's BN+SiLU too.
        if hs % 2 or ws % 2:
            blocks = []
            for ry in (0, 1):
                for rx in (0, 1):
                    bm = jnp.ones((h4, w4, 1), y.dtype)
                    if ry and hs % 2:
                        bm = bm.at[h4 - 1].set(0)
                    if rx and ws % 2:
                        bm = bm.at[:, w4 - 1].set(0)
                    blocks.append(jnp.broadcast_to(bm, (h4, w4, c_stem)))
            y = y * jnp.concatenate(blocks, -1)
        y = jax.lax.conv_general_dilated(
            y, k_base.astype(y.dtype), window_strides=(1, 1),
            padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _bn_silu(y, base_p["BatchNorm_0"], base_s["BatchNorm_0"],
                        eps=1e-3, dtype=dtype)

    return front
