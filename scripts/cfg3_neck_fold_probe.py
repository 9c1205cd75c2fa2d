#!/usr/bin/env python
"""cfg3 neck+head ROW-FOLD probe (VERDICT r4 item 3).

The r4 cfg3 audit put neck+head at 82.1 ms vs a ~40 ms per-conv scale:
the level-0 @640 64-channel maps are 2x lane-padded, and up2-by-repeat
forces relayouts. This probe prices a ROW-fold (2x1 parity split:
(B,640,640,64) -> (B,320,640,128), lane-EXACT at 128 channels) of the
whole level-0 path end-to-end BEFORE any product code lands:

* soem_0's contraction epilogue emits the row-folded layout
  (explicit reshape+transpose; the hope is XLA fuses it);
* soem_1's fused 6x6-s2 experts conv consumes the folded layout as a
  (3,6,2ci,F) stride-(1,2) conv — ZERO FLOP overhead (the row taps
  biject onto (folded row, parity) pairs, exactly like the RTM fold's
  stride-2 exit);
* FPN level-0: up2 becomes column-repeat + channel-tile (the row
  dimension never materializes), the 1x1 stride-2 reads parity block 0
  with stride (1,2);
* x0_conv_out 3x3, two variants:
    rf_dense  — dense row-folded kernel (3,3,128,128): 2x FLOPs, all
                lane-dense bytes; head 1x1s fold block-diagonally and
                only the small head outputs unfold (bitwise decode);
    rf_unfold — unfold before it, conv+head run as today.

All folded kernels embed the original weights with exact zeros
(reassociation-level numerics — sanity-checked here vs model.apply at
bf16 tolerance; NOT a parity test, the landing tests are).

Methodology: forward-only (front -> heads), one jit program per
variant, value-fetch sync, in-context deltas only (CLAUDE.md rule).
A functional re-implementation of the stock forward is timed alongside
model.apply to validate its faithfulness.

Usage: python scripts/cfg3_neck_fold_probe.py [--batch 32] [--input 1280]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from uavdet_tpu.utils.timing import time_per_iter as _timer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--input", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--check", action="store_true",
                    help="run the bf16 output sanity check (CPU ok)")
    args = ap.parse_args()

    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from uavdet_tpu.models.dysoem_simfpn import (DySOEM_SimFPN,
                                                 fold_input_stem)
    from uavdet_tpu.ops.fold_rtm import _bn_silu

    B, S = args.batch, args.input
    dt = jnp.bfloat16
    model = DySOEM_SimFPN(dtype=dt)
    x0i = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0i, train=False)
    p, st = variables["params"], variables["batch_stats"]
    folded_model = DySOEM_SimFPN(stem_folded=True, dtype=dt)
    front = fold_input_stem(variables, dtype=dt)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(B, S, S, 3), dtype=np.uint8))

    TEMP = 30.0

    # ---------------- helpers -------------------------------------------

    def conv(x, k, strides=(1, 1), padding=((1, 1), (1, 1))):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def dense(x, blk):
        return x @ blk["kernel"].astype(dt) + blk["bias"].astype(dt)

    def attn_mlp(pooled, sp):
        a = jax.nn.relu(dense(pooled, sp["attn_fc1"]))
        a = dense(a, sp["attn_fc2"])
        return jax.nn.softmax(
            a.astype(jnp.promote_types(a.dtype, jnp.float32)) / TEMP,
            axis=-1)

    def contract(y, attn, oc):
        b, hh, ww, c = y.shape
        y5 = y.reshape(b, hh, ww, c // oc, oc)
        return jnp.einsum("bhwec,be->bhwc", y5, attn.astype(y.dtype))

    def fuse_s2d_kernel(k, kk=2):
        ks, _, kkci, f = k.shape
        ci = kkci // (kk * kk)
        ker = k.reshape(ks, ks, kk, kk, ci, f)
        return ker.transpose(0, 2, 1, 3, 4, 5).reshape(
            kk * ks, kk * ks, ci, f)

    def rfold(x):
        b, h, w, c = x.shape
        return x.reshape(b, h // 2, 2, w, c).transpose(
            0, 1, 3, 2, 4).reshape(b, h // 2, w, 2 * c)

    def runfold(x):
        b, h2, w, c2 = x.shape
        c = c2 // 2
        return x.reshape(b, h2, w, 2, c).transpose(
            0, 1, 3, 2, 4).reshape(b, 2 * h2, w, c)

    def rfold_kernel_3x3_s1(k):
        """(3,3,ci,co) -> (3,3,2ci,2co) row-folded (d = 2f + p - r)."""
        _, kx, ci, co = k.shape
        kf = jnp.zeros((3, kx, 2 * ci, 2 * co), k.dtype)
        for r in (0, 1):
            for pp in (0, 1):
                for f in (-1, 0, 1):
                    d = 2 * f + pp - r
                    if -1 <= d <= 1:
                        kf = kf.at[f + 1, :, ci * pp:ci * (pp + 1),
                                   co * r:co * (r + 1)].set(k[d + 1])
        return kf

    def rfold_kernel_6x6_s2(k6):
        """(6,6,ci,F) stride-2 pad-2 -> (3,6,2ci,F) stride-(1,2) pad
        ((1,1),(2,2)) on the row-folded input (dy - 2 = 2f + p)."""
        _, kx, ci, f_ = k6.shape
        kf = jnp.zeros((3, kx, 2 * ci, f_), k6.dtype)
        for pp in (0, 1):
            for f in (-1, 0, 1):
                dy = 2 * f + pp + 2
                kf = kf.at[f + 1, :, ci * pp:ci * (pp + 1), :].set(k6[dy])
        return kf

    def tile2(v):
        return jnp.tile(v, 2)

    # ---------------- forward builder -----------------------------------

    def make_fwd(mode):
        assert mode in ("stock", "rf_dense", "rf_unfold")
        rf = mode != "stock"

        def fwd(x):
            f0 = front(x)                                 # (B,S/2,S/2,128)
            # soem_0 (skip_s2d)
            sp, ss = p["soem_0"], st["soem_0"]
            attn = attn_mlp(jnp.mean(f0, (1, 2)), sp)
            y = conv(f0, sp["experts"]["kernel"]) \
                + sp["experts"]["bias"].astype(dt)
            y = contract(y, attn, 64)
            if rf:
                yrf = rfold(y)                            # (B,S/4,S/2,128)
                x0 = _bn_silu(yrf, sp["BatchNorm_0"], ss["BatchNorm_0"],
                              eps=1e-5, tile=2, dtype=dt)
            else:
                x0 = _bn_silu(y, sp["BatchNorm_0"], ss["BatchNorm_0"],
                              eps=1e-5, dtype=dt)

            # soem_1 (fused 6x6 s2 on x0)
            sp, ss = p["soem_1"], st["soem_1"]
            k6 = fuse_s2d_kernel(sp["experts"]["kernel"])   # (6,6,64,384)
            if rf:
                kf = rfold_kernel_6x6_s2(k6)                # (3,6,128,384)
                y = conv(x0, kf, strides=(1, 2),
                         padding=((1, 1), (2, 2))) \
                    + sp["experts"]["bias"].astype(dt)
                b2, h2, w2, _ = x0.shape
                m = x0.reshape(b2, h2, w2 // 2, 2, 128).mean(
                    axis=(1, 2)).astype(dt)                 # (B,pj,pi*64+c)
                pooled = m.reshape(b2, 2, 2, 64).transpose(
                    0, 2, 1, 3).reshape(b2, 256)            # (pi,pj,c)
            else:
                y = conv(x0, k6, strides=(2, 2),
                         padding=((2, 2), (2, 2))) \
                    + sp["experts"]["bias"].astype(dt)
                b2, h2, w2, _ = x0.shape
                pooled = x0.reshape(b2, h2 // 2, 2, w2 // 2, 2, 64).mean(
                    axis=(1, 3)).astype(dt).reshape(b2, 256)
            attn = attn_mlp(pooled, sp)
            y = contract(y, attn, 128)
            x1 = _bn_silu(y, sp["BatchNorm_0"], ss["BatchNorm_0"],
                          eps=1e-5, dtype=dt)               # (B,S/4,S/4,128)

            # soem_2 (fused 6x6 s2 on x1) — identical both modes
            sp, ss = p["soem_2"], st["soem_2"]
            k6 = fuse_s2d_kernel(sp["experts"]["kernel"])   # (6,6,128,768)
            y = conv(x1, k6, strides=(2, 2), padding=((2, 2), (2, 2))) \
                + sp["experts"]["bias"].astype(dt)
            b2, h2, w2, _ = x1.shape
            pooled = x1.reshape(b2, h2 // 2, 2, w2 // 2, 2, 128).mean(
                axis=(1, 3)).astype(dt).reshape(b2, 512)
            attn = attn_mlp(pooled, sp)
            y = contract(y, attn, 256)
            x2 = _bn_silu(y, sp["BatchNorm_0"], ss["BatchNorm_0"],
                          eps=1e-5, dtype=dt)               # (B,S/8,S/8,256)

            # neck
            pn = p["neck"]

            def up2(z):
                return jnp.repeat(jnp.repeat(z, 2, axis=1), 2, axis=2)

            def c1x1(z, name, strides=(1, 1)):
                return conv(z, pn[name]["kernel"], strides=strides,
                            padding=((0, 0), (0, 0))) \
                    + pn[name]["bias"].astype(dt)

            center = x1 + up2(c1x1(x2, "x2_in_down")) + x1
            cd = c1x1(center, "center_down")                # (B,S/4,S/4,64)
            if rf:
                x0 = x0 + jnp.tile(jnp.repeat(cd, 2, axis=2), (1, 1, 1, 2))
                x1n = center + conv(
                    x0[..., :64], pn["x0_out_up"]["kernel"],
                    strides=(1, 2), padding=((0, 0), (0, 0))) \
                    + pn["x0_out_up"]["bias"].astype(dt)
            else:
                x0 = x0 + up2(cd)
                x1n = center + c1x1(x0, "x0_out_up", strides=(2, 2))
            x2 = x2 + c1x1(x1n, "x1_out_up", strides=(2, 2))

            co = pn["x0_conv_out"]
            cs = st["neck"]["x0_conv_out"]
            if mode == "rf_dense":
                kf = rfold_kernel_3x3_s1(co["Conv_0"]["kernel"])
                x0c = conv(x0, kf)                          # (B,S/4,S/2,128)
                x0c = _bn_silu(x0c, co["BatchNorm_0"], cs["BatchNorm_0"],
                               eps=1e-5, tile=2, dtype=dt)
            else:
                if mode == "rf_unfold":
                    x0 = runfold(x0)
                x0c = conv(x0, co["Conv_0"]["kernel"])
                x0c = _bn_silu(x0c, co["BatchNorm_0"], cs["BatchNorm_0"],
                               eps=1e-5, dtype=dt)
            x1c = conv(x1n, pn["x1_conv_out"]["Conv_0"]["kernel"])
            x1c = _bn_silu(x1c, pn["x1_conv_out"]["BatchNorm_0"],
                           st["neck"]["x1_conv_out"]["BatchNorm_0"],
                           eps=1e-5, dtype=dt)
            x2c = conv(x2, pn["x2_conv_out"]["Conv_0"]["kernel"])
            x2c = _bn_silu(x2c, pn["x2_conv_out"]["BatchNorm_0"],
                           st["neck"]["x2_conv_out"]["BatchNorm_0"],
                           eps=1e-5, dtype=dt)

            # head
            ph = p["yolo_head"]
            outs = []
            for i, f in enumerate((x0c, x1c, x2c)):
                ob, bb = ph[f"obj_{i}"]["Conv_0"], ph[f"bbox_{i}"]["Conv_0"]
                if i == 0 and mode == "rf_dense":
                    # block-diagonal 1x1 on the folded map; unfold the
                    # SMALL outputs (bitwise-identical decode order)
                    def blk(k):
                        _, _, ci, co_ = k.shape
                        kf = jnp.zeros((1, 1, 2 * ci, 2 * co_), k.dtype)
                        kf = kf.at[:, :, :ci, :co_].set(k)
                        kf = kf.at[:, :, ci:, co_:].set(k)
                        return kf
                    obj = conv(f, blk(ob["kernel"]),
                               padding=((0, 0), (0, 0))) \
                        + tile2(ob["bias"]).astype(dt)
                    bbox = conv(f, blk(bb["kernel"]),
                                padding=((0, 0), (0, 0))) \
                        + tile2(bb["bias"]).astype(dt)
                    obj = runfold(obj)
                    bbox = runfold(bbox)
                else:
                    obj = conv(f, ob["kernel"],
                               padding=((0, 0), (0, 0))) \
                        + ob["bias"].astype(dt)
                    bbox = conv(f, bb["kernel"],
                                padding=((0, 0), (0, 0))) \
                        + bb["bias"].astype(dt)
                b3, h3, w3, _ = obj.shape
                obj = obj.reshape(b3, h3, w3, 3, 1).transpose(0, 3, 1, 2, 4)
                bbox = bbox.reshape(b3, h3, w3, 3, 4).transpose(
                    0, 3, 1, 2, 4)
                outs.append((obj, bbox))
            return outs

        return fwd

    # ---------------- sanity check --------------------------------------

    if args.check:
        Bc, Sc = 2, 64
        xi = jnp.asarray(np.random.default_rng(1).integers(
            0, 256, size=(Bc, Sc, Sc, 3), dtype=np.uint8))
        ref = folded_model.apply(variables, front(xi), train=False)
        for mode in ("stock", "rf_dense", "rf_unfold"):
            outs = make_fwd(mode)(xi)
            for (obj, bbox), r in zip(outs, ref):
                np.testing.assert_allclose(
                    np.asarray(obj, np.float32),
                    np.asarray(r.obj, np.float32), rtol=0.1, atol=0.05)
                np.testing.assert_allclose(
                    np.asarray(bbox, np.float32),
                    np.asarray(r.bbox, np.float32), rtol=0.1, atol=0.05)
            print(f"{mode}: outputs match model.apply (bf16 tolerance)")
        return

    # ---------------- timing --------------------------------------------

    def t(name, run, sync):
        dtm = _timer(run, sync, iters=args.iters)
        print(f"{name:<34s} {dtm * 1e3:8.2f} ms   "
              f"({B / dtm:6.1f} fwd-fps)")
        return dtm

    apply_j = jax.jit(
        lambda x: folded_model.apply(variables, front(x), train=False))
    t("model.apply (stock path)", lambda: apply_j(imgs),
      lambda o: float(o[0].obj.astype(jnp.float32)[0, 0, 0, 0, 0]))

    for mode in ("stock", "rf_unfold", "rf_dense"):
        fn = jax.jit(make_fwd(mode))
        t(f"functional {mode}", lambda: fn(imgs),
          lambda o: float(o[0][0].astype(jnp.float32)[0, 0, 0, 0, 0]))


if __name__ == "__main__":
    main()
