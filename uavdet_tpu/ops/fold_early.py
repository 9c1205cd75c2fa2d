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


# ---------------------------------------------------------------------------
# TRAINABLE fold: the same folded layout in the training step
# ---------------------------------------------------------------------------

def _prefix_class_counts(cfg_prefix):
    """Module-creation counts per interpreter class for a config prefix
    (flax @nn.compact auto-numbering depends only on creation order)."""
    counts = {"DyConvModule_": 0, "ResidualBlock_": 0, "CNNBlock_": 0,
              "ScalePrediction_": 0}
    for tok in cfg_prefix:
        if tok[0] == "B":
            counts["ResidualBlock_"] += 1
        elif tok[0] == "S":
            counts["ResidualBlock_"] += 1
            counts["CNNBlock_"] += 1
            counts["ScalePrediction_"] += 1
        elif tok[0] == "U":
            pass
        elif tok[0] == "DyConv":
            counts["DyConvModule_"] += 1
        else:
            counts["CNNBlock_"] += 1
    return counts


def _shift_name(name, counts, sign):
    for pref, n in counts.items():
        tail = name[len(pref):]
        if n and name.startswith(pref) and tail.isdigit():
            return f"{pref}{int(tail) + sign * n}"
    return name


def _bn_train_folded(y, p, s, dt, tile, momentum=0.9, eps=1e-5):
    """flax BatchNorm train-mode semantics on a quadrant-folded map.

    Batch statistics per ORIGINAL channel are means over (batch, space,
    quadrant-group) — the identical element population the unfolded BN
    reduces, summed tile-first (reassociation-level equal). Mirrors
    flax `_compute_stats` (force_float32_reductions promotion, the
    fast-variance mean²-of-x formula, the max(0,·) clip) and
    `_normalize` (x - mean at binop-promoted dtype, rsqrt·scale
    multiply, one canonicalized cast) — see normalization.py in the
    installed flax. Returns (normalized, new_stats)."""
    from flax.linen import dtypes as _fld

    c = s["mean"].shape[0]
    pt = jnp.promote_types(dt or jnp.result_type(y), jnp.float32)
    xp = y.astype(pt)
    mu_t = jnp.mean(xp, axis=(0, 1, 2))
    mu2_t = jnp.mean(xp * xp, axis=(0, 1, 2))
    if tile > 1:
        mu = jnp.mean(mu_t.reshape(tile, c), axis=0)
        mu2 = jnp.mean(mu2_t.reshape(tile, c), axis=0)
    else:
        mu, mu2 = mu_t, mu2_t
    var = jnp.maximum(0.0, mu2 - mu * mu)
    new_stats = {"mean": momentum * s["mean"] + (1 - momentum) * mu,
                 "var": momentum * s["var"] + (1 - momentum) * var}

    def t(v):
        return jnp.tile(v, tile) if tile > 1 else v

    out = y - t(mu)
    mul = jax.lax.rsqrt(t(var) + eps) * t(p["scale"])
    out = out * mul + t(p["bias"])
    out = jnp.asarray(out, _fld.canonicalize_dtype(y, p["scale"], p["bias"],
                                                   dtype=dt))
    return out, new_stats


def fold_early_train_apply(model):
    """Trainable parity-folded early stage for interpreter models
    (DyYOLO / BaselineModel): tokens [2:4] must be ["B",1] + [C,3,2].

    Returns ``apply(variables, x) -> (outs, batch_stats)`` matching
    ``model.apply(variables, x, train=True, mutable=['batch_stats'])``
    up to reassociation (same contractions plus exact-zero kernel
    blocks; batch statistics reduce the identical element population
    quadrant-group-first) — f64-parity-tested in tests/test_fold_train.py.
    Returns None when the config doesn't match.

    Why this exists: the training step pays the same 2-4x lane-padding
    tax on the 32/64-channel @H/2 maps the inference fold recovers —
    measured +4.5% on the cfg6 train step (scripts/train_fold_probe.py,
    PERF.md round-4). Gradients flow to the ORIGINAL parameter tree
    (kernels are folded in-graph; folding is linear), so checkpoints,
    the optimizer state, and every other consumer are unchanged.
    """
    cfg = [tuple(t) for t in model.layer_config]
    if len(cfg) < 5 or cfg[2] != ("B", 1):
        return None
    t3 = cfg[3]
    if not (len(t3) == 3 and isinstance(t3[0], int)
            and t3[1] == 3 and t3[2] == 2):
        return None

    from ..models.interpreter import YOLOInterpreter

    mdt = getattr(model, "dtype", None)
    stem = YOLOInterpreter(
        layer_config=tuple(cfg[:2]), n_anchors=model.n_anchors,
        attn_temperature=getattr(model, "attn_temperature", 30.0),
        stop_after=2, dtype=mdt)
    tail = model.clone(layer_config=tuple(cfg[4:]))
    counts = _prefix_class_counts(cfg[:4])
    consumed = {f"{pref}{i}" for pref, n in counts.items()
                for i in range(n)}
    # top-level names of the two folded modules (the stem prefix may
    # itself create CNNBlocks — e.g. the tiny test config — so the
    # indices are prefix-dependent)
    rb_name = "ResidualBlock_%d" % _prefix_class_counts(
        cfg[:2])["ResidualBlock_"]
    ds_name = "CNNBlock_%d" % _prefix_class_counts(cfg[:3])["CNNBlock_"]

    def rekey(tree, sign):
        return {_shift_name(k, counts, sign): v for k, v in tree.items()
                if not (sign < 0 and k in consumed)}

    def middle(p_net, s_net, xf):
        rb_p = p_net[rb_name]
        rb_s = s_net[rb_name]
        ds_p, ds_s = p_net[ds_name], s_net[ds_name]
        dt = mdt or jnp.float32

        def kern(blk):
            return blk["Conv_0"]["kernel"]

        k1f = fold_kernel_1x1(kern(rb_p["CNNBlock_0"])).astype(dt)
        k3f = fold_kernel_3x3_s1(kern(rb_p["CNNBlock_1"])).astype(dt)
        k2f = fold_kernel_3x3_s2(kern(ds_p)).astype(dt)

        xf = xf.astype(dt)
        y = _conv(xf, k1f, "VALID")
        y, st1 = _bn_train_folded(
            y, rb_p["CNNBlock_0"]["BatchNorm_0"],
            rb_s["CNNBlock_0"]["BatchNorm_0"], mdt, tile=4)
        y = jax.nn.leaky_relu(y, negative_slope=0.1)
        y = _conv(y, k3f, "SAME")
        y, st3 = _bn_train_folded(
            y, rb_p["CNNBlock_1"]["BatchNorm_0"],
            rb_s["CNNBlock_1"]["BatchNorm_0"], mdt, tile=4)
        y = jax.nn.leaky_relu(y, negative_slope=0.1)
        xf = xf + y
        y = _conv(xf, k2f, ((1, 0), (1, 0)))
        y, st2 = _bn_train_folded(y, ds_p["BatchNorm_0"],
                                  ds_s["BatchNorm_0"], mdt, tile=1)
        y = jax.nn.leaky_relu(y, negative_slope=0.1)
        rb_stats = {"CNNBlock_0": {"BatchNorm_0": st1},
                    "CNNBlock_1": {"BatchNorm_0": st3}}
        ds_stats = {"BatchNorm_0": st2}
        return y, rb_stats, ds_stats

    def apply(variables, x):
        p_net = variables["params"]["net"]
        s_net = variables["batch_stats"]["net"]
        x1, stem_mut = stem.apply(
            {"params": p_net, "batch_stats": s_net}, x, train=True,
            mutable=["batch_stats"])
        xf = fold_nhwc(x1)
        y, rb_stats, ds_stats = middle(p_net, s_net, xf)
        tail_vars = {"params": {"net": rekey(p_net, -1)},
                     "batch_stats": {"net": rekey(s_net, -1)}}
        outs, tail_mut = tail.apply(tail_vars, y, train=True,
                                    mutable=["batch_stats"])
        new_net = dict(s_net)
        for k in stem_mut["batch_stats"]:
            if k in new_net:
                new_net[k] = stem_mut["batch_stats"][k]
        new_net[rb_name] = rb_stats
        new_net[ds_name] = ds_stats
        for k, v in rekey(tail_mut["batch_stats"]["net"], +1).items():
            new_net[k] = v
        return outs, {"net": new_net}

    return apply
