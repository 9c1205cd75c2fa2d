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

``fold_rtm_front`` is the EVAL fold (running BN statistics tile
per-phase exactly). ``fold_rtm_train_apply`` is the TRAIN-mode fold
(VERDICT r4 item 6): batch statistics are computed over the identical
element population via masked quadrant-group sums (the
ops/fold_early._bn_train_folded treatment, extended with validity
masks for odd stem extents), so cfg5's train step stops paying the 4x
stem lane tax. Exactness is reassociation-level, f64-parity-tested in
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


def _fold_stem_kernel_jnp(k5):
    """Differentiable (jnp) variant of ``_fold_stem_kernel`` — the train
    fold builds the folded kernel IN-GRAPH so gradients flow to the
    original 5x5 parameter (embedding is linear)."""
    kk, _, ci, co = k5.shape
    k7 = jnp.zeros((kk + 2, kk + 2, ci, 4 * co), k5.dtype)
    for ry in (0, 1):
        for rx in (0, 1):
            q = 2 * ry + rx
            k7 = k7.at[2 * ry:2 * ry + kk, 2 * rx:2 * rx + kk, :,
                       q * co:(q + 1) * co].set(k5)
    return k7


def _quad_mask(h4, w4, hs, ws, c_stem, dtype):
    """(h4, w4, 4*c_stem) validity mask: 0 where a quadrant's position
    maps past the original stem extent (odd hs/ws put a pad row/col in
    the last fold pair), 1 elsewhere. None when everything is valid."""
    if hs % 2 == 0 and ws % 2 == 0:
        return None
    blocks = []
    for ry in (0, 1):
        for rx in (0, 1):
            bm = jnp.ones((h4, w4, 1), dtype)
            if ry and hs % 2:
                bm = bm.at[h4 - 1].set(0)
            if rx and ws % 2:
                bm = bm.at[:, w4 - 1].set(0)
            blocks.append(jnp.broadcast_to(bm, (h4, w4, c_stem)))
    return jnp.concatenate(blocks, -1)


def _bn_silu_train_quad(y, p, s, dt, mask, n_valid, momentum, eps,
                        tile=4):
    """flax BatchNorm TRAIN semantics on a quadrant-folded map with a
    validity mask: batch statistics per ORIGINAL channel are masked
    sums over (batch, space, quadrant-group) divided by the EXACT
    unfolded population ``n_valid`` (B*hs*ws) — the identical element
    set the unfolded BN reduces, summed quadrant-group-first
    (reassociation-level equal; mirrors flax `_compute_stats`'s
    force_float32_reductions + fast-variance formula and `_normalize`'s
    promotion/cast order — see ops/fold_early._bn_train_folded).
    Returns (silu(normalized) re-zeroed at masked positions, new_stats).
    """
    from flax.linen import dtypes as _fld

    c = s["mean"].shape[0]
    pt = jnp.promote_types(dt or jnp.result_type(y), jnp.float32)
    xp = y.astype(pt)
    if mask is not None:
        xp = xp * mask.astype(pt)
    sums = jnp.sum(xp, axis=(0, 1, 2))
    sums2 = jnp.sum(xp * xp, axis=(0, 1, 2))
    if tile > 1:
        sums = jnp.sum(sums.reshape(tile, c), axis=0)
        sums2 = jnp.sum(sums2.reshape(tile, c), axis=0)
    mu = sums / n_valid
    mu2 = sums2 / n_valid
    var = jnp.maximum(0.0, mu2 - mu * mu)
    new_stats = {"mean": momentum * s["mean"] + (1 - momentum) * mu,
                 "var": momentum * s["var"] + (1 - momentum) * var}

    def t(v):
        return jnp.tile(v, tile) if tile > 1 else v

    out = y - t(mu)
    mul = jax.lax.rsqrt(t(var) + eps) * t(p["scale"])
    out = out * mul + t(p["bias"])
    out = jnp.asarray(out, _fld.canonicalize_dtype(y, p["scale"],
                                                   p["bias"], dtype=dt))
    out = jax.nn.silu(out)
    if mask is not None:
        # masked positions are the downstream conv's zero padding — the
        # epilogue maps exact zeros to silu(bias - mean*mul), so re-zero
        out = out * mask.astype(out.dtype)
    return out, new_stats


def fold_rtm_train_apply(model):
    """Trainable parity-folded RTM front (the cfg5 counterpart of
    ops/fold_early.fold_early_train_apply).

    Returns ``apply(variables, x, rngs) -> (outs, batch_stats)``
    matching ``model.apply(variables, x, train=True,
    mutable=['batch_stats'], rngs=rngs)`` up to reassociation: the stem
    + MDyCSP_1.base_conv run in the 2x2-folded layout (the 4x-lane-
    padded 32-ch @H/2 stem map never materializes in fwd OR bwd), with
    BN batch statistics reduced over the identical element population
    via masked quadrant-group sums. Gradients flow to the ORIGINAL
    parameter tree (kernels folded in-graph; folding is linear), so
    checkpoints and optimizer state are unchanged. Returns None for a
    ``stem_folded`` model (nothing left to fold).

    Reference op being re-designed: reference model/RTMUAVDet.py:28-45
    (train path) — lane padding is a TPU-only concern."""
    if getattr(model, "stem_folded", False):
        return None
    tail = model.clone(stem_folded=True)
    mdt = model.dtype
    dt = mdt or jnp.float32

    def apply(variables, x, rngs=None):
        p = variables["params"]
        s = variables["batch_stats"]
        stem_p = p["stem"]["RTMConvModule_0"]
        stem_s = s["stem"]["RTMConvModule_0"]
        base_p = p["MDyCSP_1"]["base_conv"]
        base_s = s["MDyCSP_1"]["base_conv"]

        k7 = _fold_stem_kernel_jnp(stem_p["Conv_0"]["kernel"]).astype(dt)
        k2 = fold_kernel_3x3_s2(base_p["Conv_0"]["kernel"]).astype(dt)
        c_stem = k7.shape[-1] // 4

        x = x.astype(dt)
        b, h, w, _ = x.shape
        hs, ws = (h - 3) // 2 + 1, (w - 3) // 2 + 1
        h4, w4 = (hs - 1) // 2 + 1, (ws - 1) // 2 + 1

        y = jax.lax.conv_general_dilated(
            x, k7, window_strides=(4, 4),
            padding=(_fold_pad(h, h4), _fold_pad(w, w4)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        mask = _quad_mask(h4, w4, hs, ws, c_stem, dt)
        y, stem_new = _bn_silu_train_quad(
            y, stem_p["BatchNorm_0"], stem_s["BatchNorm_0"], mdt, mask,
            n_valid=b * hs * ws, momentum=0.97, eps=1e-3, tile=4)
        y = jax.lax.conv_general_dilated(
            y, k2.astype(y.dtype), window_strides=(1, 1),
            padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y, base_new = _bn_silu_train_quad(
            y, base_p["BatchNorm_0"], base_s["BatchNorm_0"], mdt,
            mask=None, n_valid=b * h4 * w4, momentum=0.97, eps=1e-3,
            tile=1)

        outs, mut = tail.apply({"params": p, "batch_stats": s}, y,
                               train=True, mutable=["batch_stats"],
                               rngs=rngs)
        new_stats = dict(mut["batch_stats"])
        new_stats["stem"] = {"RTMConvModule_0": {"BatchNorm_0": stem_new}}
        csp1 = dict(new_stats.get("MDyCSP_1", {}))
        csp1["base_conv"] = {"BatchNorm_0": base_new}
        new_stats["MDyCSP_1"] = csp1
        return outs, new_stats

    return apply


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
