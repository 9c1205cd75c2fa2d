"""Row-folded DySOEM level-0 path: soem_0's output through the FPN and
head in a 2x1 parity-split layout — the cfg3 neck+head lane-padding fix
(VERDICT r4 item 3).

Why: at DySOEM bs=32 @1280 the level-0 feature map is 64 channels at
640² — every touch moves 2x its real bytes through half-empty 128-lane
tiles, and the FPN's up2-by-repeat forces relayouts on the biggest map
in the program (r4 audit: neck+head 82.1 ms vs a ~40 ms per-conv
scale). Folding ROWS into channels ((B, H, W, 64) -> (B, H/2, W, 128))
makes the level-0 path lane-EXACT:

* soem_0's contraction epilogue emits the row-folded map (BN params
  parity-tiled — running statistics, exact);
* soem_1's fused (2·ks)² stride-2 experts conv consumes it as a
  (ks, 2·ks, 2ci, F) stride-(1,2) conv — the row taps biject onto
  (folded row, parity) pairs, so ZERO FLOP overhead (the same exit
  trick as ops/fold_rtm's base conv);
* FPN level-0: up2 becomes column-repeat + channel-tile (the unfolded
  row dimension never exists), the 1x1 stride-2 output conv reads
  parity block 0 with stride (1,2);
* x0_conv_out's 3x3 runs as a dense row-folded (3,3,2c,2c) kernel —
  2x FLOPs, but the conv is bytes-bound at these widths (measured: the
  unfold-first alternative LOSES, 318.6 vs 270.3 ms —
  scripts/cfg3_neck_fold_probe.py);
* the head's 1x1s fold block-diagonally and only the SMALL head
  outputs unfold, so the decode consumes bit-identically ordered
  tensors.

All folded kernels embed the original weights with exact zeros
(reassociation-level numerics, f64-parity-tested in
tests/test_fold_soem_neck.py). Measured end-to-end on v5e (probe,
bs=32 @1280 forward): 285.7 -> 270.3 ms; bench cfg3 result in PERF.md
round-5.

EVAL-ONLY (BN statistics consume running averages; the train step
keeps the stock layout). Reference op being re-designed:
reference model/DySOEM_SimFPN.py:77-126 — plain NCHW torch there; lane
padding is a TPU-only concern, so this module has no reference
counterpart.
"""

from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.datatypes import DetectionResults
from .fold_rtm import _bn_silu


def _swap_parity_perm(oc: int) -> np.ndarray:
    """Self-inverse channel permutation between the colfold-of-rowfold
    order (pj, pi, c) and the true s2d order (pi, pj, c), blocks of
    ``oc`` channels."""
    perm = np.empty(4 * oc, np.int32)
    for pi in range(2):
        for pj in range(2):
            dat = (2 * pj + pi) * oc
            s2d = (2 * pi + pj) * oc
            perm[dat:dat + oc] = np.arange(s2d, s2d + oc)
    return perm


def rfold(x):
    """(B, H, W, C) -> (B, H/2, W, 2C): out[:, i, j, C*p + c] =
    x[:, 2i+p, j, c]."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w, c).transpose(
        0, 1, 3, 2, 4).reshape(b, h // 2, w, 2 * c)


def runfold(x):
    """Inverse of rfold."""
    b, h2, w, c2 = x.shape
    c = c2 // 2
    return x.reshape(b, h2, w, 2, c).transpose(
        0, 1, 3, 2, 4).reshape(b, 2 * h2, w, c)


def rfold_kernel_3x3_s1(k):
    """(3,3,ci,co) SAME -> (3,3,2ci,2co) row-folded SAME: output parity
    r at folded row i is the original conv at row 2i+r; folded offset f
    and input parity p reach original offset d = 2f + p - r, block
    nonzero iff d in {-1,0,1}."""
    _, kx, ci, co = k.shape
    kf = jnp.zeros((3, kx, 2 * ci, 2 * co), k.dtype)
    for r in (0, 1):
        for p in (0, 1):
            for f in (-1, 0, 1):
                d = 2 * f + p - r
                if -1 <= d <= 1:
                    kf = kf.at[f + 1, :, ci * p:ci * (p + 1),
                               co * r:co * (r + 1)].set(k[d + 1])
    return kf


def rfold_kernel_s2(k2s, ks: int):
    """Fused s2d experts kernel (2ks, 2ks, ci, F) stride-2 pad-ks//2·2
    -> (2ks-? ) row-folded: (ks, 2ks, 2ci, F) stride-(1,2) with row
    padding (ks//2, ks//2). Row tap dy - pad = 2f + p is a bijection
    onto (folded offset f, parity p), so every original tap appears
    exactly once — zero FLOP overhead."""
    rows, kx, ci, f_ = k2s.shape
    assert rows == 2 * ks
    pad = 2 * (ks // 2)
    kf = jnp.zeros((ks, kx, 2 * ci, f_), k2s.dtype)
    for p in (0, 1):
        for f in range(-(ks // 2), ks // 2 + 1):
            dy = 2 * f + p + pad
            kf = kf.at[f + ks // 2, :, ci * p:ci * (p + 1), :].set(k2s[dy])
    return kf


def _block_diag_1x1(k):
    """(1,1,ci,co) -> (1,1,2ci,2co) block-diagonal."""
    _, _, ci, co = k.shape
    kf = jnp.zeros((1, 1, 2 * ci, 2 * co), k.dtype)
    kf = kf.at[:, :, :ci, :co].set(k)
    kf = kf.at[:, :, ci:, co:].set(k)
    return kf


def _fuse_s2d_kernel(k, kk=2):
    """(ks,ks,kk²·ci,F) on the s2d'd map -> (kk·ks, kk·ks, ci, F)
    stride-kk on the pre-s2d map (the _ExpertsConv fused permutation)."""
    ks, _, kkci, f = k.shape
    ci = kkci // (kk * kk)
    ker = k.reshape(ks, ks, kk, kk, ci, f)
    return ker.transpose(0, 2, 1, 3, 4, 5).reshape(
        kk * ks, kk * ks, ci, f)


def fold_soem_neck_forward(model, variables, dyconv: bool = None,
                           dyconv_interpret: bool = False,
                           stop_after: str = None):
    """Build the complete row-folded DySOEM_SimFPN inference forward.

    -> ``fn(x) -> List[DetectionResults]`` equal to
    ``model.clone(stem_folded=True).apply(variables, front(x),
    train=False)`` with ``front = fold_input_stem(variables)`` — i.e.
    the full folded-stem fast path — up to reassociation, with
    BIT-IDENTICALLY shaped/ordered head outputs (the decode can't tell).
    ``x`` may be raw uint8 frames (the /255 folds into the front).

    Returns None when the fold doesn't apply: needs the 3-level
    DySOEM_SimFPN shape, the fused s2d_conv path, square-factor-of-4
    inputs (checked at trace time), and an un-folded (stock) model.

    ``dyconv``: run soem_1/soem_2 through the per-sample mixed-kernel
    Pallas conv (ops/pallas_dyconv — E× fewer FLOPs than the stacked
    form, no expert map; measured verdict in PERF.md round-5). The
    kernel is bf16-only, so the path engages only for bf16 models
    (``None`` → auto: on for bf16 models except on pure-CPU backends,
    where ``dyconv_interpret`` must be set explicitly). soem_1 consumes
    the row-folded x0 as a pure ``reshape`` to the column-folded
    (B, H/4, W/4, 4·oc0) layout — the parity-block channel order is
    absorbed into a static permutation of the kernel/attention tables
    (``_swap_parity_perm``).
    """
    from ..models.dysoem_simfpn import fold_input_stem

    if (getattr(model, "stem_folded", False) or not model.s2d_conv
            or len(model.num_dy_conv) != 3
            or tuple(model.num_dy_conv) != (3, 3, 3)):
        return None
    dt = model.dtype or jnp.float32
    if dyconv is None:
        dyconv = (dt == jnp.bfloat16
                  and (dyconv_interpret
                       or jax.default_backend() != "cpu"))
    dyconv = dyconv and dt == jnp.bfloat16
    temp = float(model.attn_temperature)
    n_anchors = model.n_anchors
    p, st = variables["params"], variables["batch_stats"]
    front = fold_input_stem(variables, dtype=dt)

    def conv(x, k, strides=(1, 1), padding=((1, 1), (1, 1))):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def dense(x, blk):
        return x @ blk["kernel"].astype(dt) + blk["bias"].astype(dt)

    def attn_mlp(pooled, sp):
        a = jax.nn.relu(dense(pooled, sp["attn_fc1"]))
        a = dense(a, sp["attn_fc2"])
        # ≥f32 softmax, exactly like DynamicSOEM (an f32 bottleneck
        # would break the f64 parity contract)
        return jax.nn.softmax(
            a.astype(jnp.promote_types(a.dtype, jnp.float32)) / temp,
            axis=-1)

    def contract(y, attn, oc):
        b, hh, ww, c = y.shape
        y5 = y.reshape(b, hh, ww, c // oc, oc)
        return jnp.einsum("bhwec,be->bhwc", y5, attn.astype(y.dtype))

    ks0 = int(model.dy_kernel_size[0])
    ks1 = int(model.dy_kernel_size[1])
    ks2 = int(model.dy_kernel_size[2])
    dyconv0 = dyconv and ks0 == 3
    dyconv = dyconv and ks1 == 3 and ks2 == 3

    def dy_site(x_s2d, sp, ss, oc, kperm=None, fold_out=False,
                pooled=None, emit_gap=False):
        """soem via the per-sample mixed-kernel Pallas conv: the
        attention mixes the expert kernels in XLA (negligible FLOPs),
        the conv+BN+SiLU run in ops/pallas_dyconv. ``kperm`` reorders
        the kernel's input channels (and the GAP vector) when the data
        layout's parity-block order differs from the stored s2d order.
        ``fold_out`` emits the row-folded output directly (the narrow-Co
        variant — soem_0's Co=64 store would otherwise be 2x padded).
        ``pooled`` supplies the GAP vector (data order, pre-kperm) —
        sourced from the PRODUCER kernel's ``emit_gap`` sums so the big
        map is never re-read; ``emit_gap`` asks this site's kernel to
        emit the sums the NEXT site's GAP needs."""
        from .pallas_dyconv import mixed_bias, mixed_kernel, pallas_dyconv

        k = jnp.asarray(sp["experts"]["kernel"], jnp.float32)
        if pooled is None:
            pooled = jnp.mean(x_s2d, (1, 2)).astype(dt)
        if kperm is not None:
            k = k[:, :, kperm, :]
            pooled = pooled[:, kperm]
        attn = attn_mlp(pooled, sp).astype(jnp.float32)
        km = mixed_kernel(k, attn, oc).astype(jnp.bfloat16)
        bp, bs_ = sp["BatchNorm_0"], ss["BatchNorm_0"]
        mul = jnp.asarray(bp["scale"], jnp.float32) * jax.lax.rsqrt(
            jnp.asarray(bs_["var"], jnp.float32) + 1e-5)
        add = (jnp.asarray(bp["bias"], jnp.float32)
               - jnp.asarray(bs_["mean"], jnp.float32) * mul)[None] \
            + mixed_bias(jnp.asarray(sp["experts"]["bias"],
                                     jnp.float32), attn, oc) * mul
        h = x_s2d.shape[1]
        steps = (16, 8, 4, 2) if (fold_out or emit_gap) \
            else (16, 8, 4, 2, 1)
        rs = max(r for r in steps if h % r == 0)
        return pallas_dyconv(x_s2d.astype(jnp.bfloat16), km, mul, add,
                             rs=rs, interpret=dyconv_interpret,
                             fold_out=fold_out, emit_gap=emit_gap)

    def fn(x):
        f0 = front(x)                                # (B, S/2, S/2, 4·cs)
        if f0.shape[1] % 2 or f0.shape[2] % 2:
            raise ValueError("fold_soem_neck needs input_size % 4 == 0")
        if stop_after == "front":                    # audit prefixes
            return f0

        # soem_0 (consumes the s2d'd map the front emits; skip_s2d) —
        # the contraction epilogue emits the ROW-FOLDED x0
        sp, ss = p["soem_0"], st["soem_0"]
        oc0 = sp["BatchNorm_0"]["scale"].shape[0]
        # will the next sites run their dyconv kernels? (drives whose
        # kernel emits the downstream GAP sums)
        bq, hq, wq, cq = f0.shape
        dy1 = (dyconv and (wq // 2) % 8 == 0 and (4 * oc0) % 128 == 0
               and (hq // 2) % 2 == 0)
        gap0 = gap1 = None
        if (dyconv0 and oc0 % 64 == 0 and cq % 128 == 0
                and wq % 8 == 0 and hq % 2 == 0):
            # per-sample mixed-kernel Pallas conv, ROW-FOLDED store
            # (fold_out): E× fewer FLOPs, no E·Co expert map, and the
            # narrow Co=64 never touches a 2x-padded lane tile.
            # emit_gap: soem_1's GAP sums ride out of this kernel —
            # the 1.67 GB x0 is never re-read for pooling.
            out = dy_site(f0, sp, ss, oc0, fold_out=True, emit_gap=dy1)
            x0, gap0 = out if dy1 else (out, None)
        else:
            attn = attn_mlp(jnp.mean(f0, (1, 2)), sp)
            y = conv(f0, sp["experts"]["kernel"],
                     padding=((1, 1), (1, 1))) \
                + sp["experts"]["bias"].astype(dt)
            y = contract(y, attn, oc0)
            x0 = _bn_silu(rfold(y), sp["BatchNorm_0"],
                          ss["BatchNorm_0"], eps=1e-5, tile=2,
                          dtype=model.dtype)
        # x0: (B, S/4, S/2, 2·oc0) row-folded, lane-exact
        if stop_after == "soem_0":
            return x0

        # soem_1: fused s2d experts conv on the row-folded input (zero
        # FLOP overhead), or the per-sample mixed-kernel Pallas conv
        # (the row-folded map REINTERPRETS as column-folded s2d via a
        # pure reshape; the parity-block order lands in the kernel
        # permutation)
        sp, ss = p["soem_1"], st["soem_1"]
        oc1 = sp["BatchNorm_0"]["scale"].shape[0]
        if dyconv and (x0.shape[2] // 2) % 8 == 0:
            b2, h2, w2, c2 = x0.shape
            x0s = x0.reshape(b2, h2, w2 // 2, 2 * c2)
            dy2 = (dyconv and ((w2 // 2) // 2) % 8 == 0
                   and (4 * oc1) % 128 == 0 and (h2 // 2) % 2 == 0
                   and h2 % 2 == 0 and (w2 // 2) % 2 == 0)
            pooled = None
            if gap0 is not None:
                pooled = (gap0.sum(axis=1).reshape(b2, 4 * oc0)
                          / (h2 * (w2 // 2))).astype(dt)
            out = dy_site(x0s, sp, ss, oc1,
                          kperm=_swap_parity_perm(oc0),
                          pooled=pooled, emit_gap=dy2)
            x1, gap1 = out if dy2 else (out, None)
        else:
            k6 = _fuse_s2d_kernel(sp["experts"]["kernel"])
            kf = rfold_kernel_s2(k6, ks1)
            pad = ks1 // 2
            y = conv(x0, kf, strides=(1, 2),
                     padding=((pad, pad), (2 * pad, 2 * pad))) \
                + sp["experts"]["bias"].astype(dt)
            # GAP per (row phase pi, col phase pj, channel): pi lives
            # on channels, pj on column parity
            b2, h2, w2, c2 = x0.shape
            m = x0.reshape(b2, h2, w2 // 2, 2, c2).mean(
                axis=(1, 2)).astype(dt)
            pooled = m.reshape(b2, 2, 2, oc0).transpose(
                0, 2, 1, 3).reshape(b2, 4 * oc0)
            attn = attn_mlp(pooled, sp)
            y = contract(y, attn, oc1)
            x1 = _bn_silu(y, sp["BatchNorm_0"], ss["BatchNorm_0"],
                          eps=1e-5, dtype=model.dtype)
        # x1: (B, S/4, S/4, oc1)
        if stop_after == "soem_1":
            return x1

        # soem_2: stock fused path (already lane-dense) or the
        # per-sample Pallas conv on the true s2d'd map
        sp, ss = p["soem_2"], st["soem_2"]
        oc2 = sp["BatchNorm_0"]["scale"].shape[0]
        if dyconv and (x1.shape[2] // 2) % 8 == 0:
            from ..models.dysoem_simfpn import space_to_depth
            pooled = None
            if gap1 is not None:
                b2, h1, w1, _ = x1.shape
                pooled = (gap1.sum(axis=1).reshape(b2, 4 * oc1)
                          / ((h1 // 2) * (w1 // 2))).astype(dt)
            x2 = dy_site(space_to_depth(x1, 2), sp, ss, oc2,
                         pooled=pooled)
        else:
            k6 = _fuse_s2d_kernel(sp["experts"]["kernel"])
            pad = 2 * (ks2 // 2)
            y = conv(x1, k6, strides=(2, 2),
                     padding=((pad, pad), (pad, pad))) \
                + sp["experts"]["bias"].astype(dt)
            b2, h2, w2, _ = x1.shape
            pooled = x1.reshape(b2, h2 // 2, 2, w2 // 2, 2, oc1).mean(
                axis=(1, 3)).astype(dt).reshape(b2, 4 * oc1)
            attn = attn_mlp(pooled, sp)
            y = contract(y, attn, oc2)
            x2 = _bn_silu(y, sp["BatchNorm_0"], ss["BatchNorm_0"],
                          eps=1e-5, dtype=model.dtype)
        # x2: (B, S/8, S/8, oc2)
        if stop_after == "soem_2":
            return x2

        # neck (SimplifiedFPN) — level-0 path in the folded layout
        pn = p["neck"]
        sn = st["neck"]

        def up2(z):
            return jnp.repeat(jnp.repeat(z, 2, axis=1), 2, axis=2)

        def c1x1(z, name, strides=(1, 1)):
            return conv(z, pn[name]["kernel"], strides=strides,
                        padding=((0, 0), (0, 0))) \
                + pn[name]["bias"].astype(dt)

        center = x1 + up2(c1x1(x2, "x2_in_down")) + x1
        cd = c1x1(center, "center_down")
        # fold(up2(cd)) = column-repeat + channel-tile (row-repeat is
        # the parity split itself)
        x0 = x0 + jnp.tile(jnp.repeat(cd, 2, axis=2), (1, 1, 1, 2))
        if stop_after == "fpn_x0":
            return x0
        # 1x1 stride-2 = parity block 0, column stride 2. (The
        # zero-padded-kernel alternative — conv the FULL folded map
        # with a (1,1,2·oc0,co) kernel whose odd-parity block is zero,
        # avoiding the lane slice — was A/B'd r5: 142.3 vs 142.7 fps,
        # neutral-to-worse; the lane slice stays.)
        x1n = center + conv(x0[..., :oc0], pn["x0_out_up"]["kernel"],
                            strides=(1, 2), padding=((0, 0), (0, 0))) \
            + pn["x0_out_up"]["bias"].astype(dt)
        x2 = x2 + c1x1(x1n, "x1_out_up", strides=(2, 2))

        def conv_out(z, name, folded):
            k = pn[name]["Conv_0"]["kernel"]
            if folded:
                k = rfold_kernel_3x3_s1(k)
            z = conv(z, k)
            return _bn_silu(z, pn[name]["BatchNorm_0"],
                            sn[name]["BatchNorm_0"], eps=1e-5,
                            tile=2 if folded else 1, dtype=model.dtype)

        x0c = conv_out(x0, "x0_conv_out", True)
        x1c = conv_out(x1n, "x1_conv_out", False)
        x2c = conv_out(x2, "x2_conv_out", False)
        if stop_after == "conv_out":
            return x0c, x1c, x2c              # all three: no DCE

        # head: level-0 1x1s block-diagonal on the folded map; only the
        # SMALL outputs unfold -> decode order bit-identical to stock.
        # (A fused obj+bbox single conv per level was A/B'd r5 and LOST
        # -5 ms end-to-end: the 15-ch fused output's relayouts cost more
        # than the halved head-input read saved — probe table, PERF.md.)
        ph = p["yolo_head"]
        outs: List[DetectionResults] = []
        for i, f in enumerate((x0c, x1c, x2c)):
            ob = ph[f"obj_{i}"]["Conv_0"]
            bb = ph[f"bbox_{i}"]["Conv_0"]
            if i == 0:
                obj = conv(f, _block_diag_1x1(ob["kernel"]),
                           padding=((0, 0), (0, 0))) \
                    + jnp.tile(ob["bias"], 2).astype(dt)
                bbox = conv(f, _block_diag_1x1(bb["kernel"]),
                            padding=((0, 0), (0, 0))) \
                    + jnp.tile(bb["bias"], 2).astype(dt)
                obj, bbox = runfold(obj), runfold(bbox)
            else:
                obj = conv(f, ob["kernel"], padding=((0, 0), (0, 0))) \
                    + ob["bias"].astype(dt)
                bbox = conv(f, bb["kernel"], padding=((0, 0), (0, 0))) \
                    + bb["bias"].astype(dt)
            b3, h3, w3, _ = obj.shape
            outs.append(DetectionResults(
                bbox=bbox.reshape(b3, h3, w3, n_anchors, 4).transpose(
                    0, 3, 1, 2, 4),
                obj=obj.reshape(b3, h3, w3, n_anchors, 1).transpose(
                    0, 3, 1, 2, 4)))
        return outs

    return fn
