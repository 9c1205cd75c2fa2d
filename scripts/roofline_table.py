#!/usr/bin/env python
"""Analytic per-section roofline for DyYOLO @640 bs=16 (VERDICT r4 3a).

Pure math — no TPU. Walks the layer_config exactly as
models/interpreter.py does and prices every conv two ways:

  floor      = max(real-FLOPs / MXU peak, real-bytes / HBM BW)
               — the physics floor no implementation can beat (this is
               where PERF.md r2's 698-fps whole-model roofline comes
               from; re-derived here per-section).
  achievable = max(real-FLOPs / MXU peak, LANE-PADDED bytes / HBM BW)
               — prices the NHWC lane layout XLA is actually forced
               into: activations with C<128 occupy a full 128-lane
               tile, so a 64-ch @320 feature map moves 2x its real
               bytes (and 32-ch moves 4x).  Compute keeps REAL FLOPs:
               the r3 imgfold measurement showed XLA's conv lowering
               beats the naive pad-K-to-128 compute model for narrow
               channels, so padded-FLOPs would overstate the floor.
               The custom stem kernels dodge lane padding by parity
               folding — the stem row reports both so the dodge's value
               is visible.

Machine ceilings from PERF.md: 148 TFLOP/s bf16, 347 GB/s HBM.

Usage: python scripts/roofline_table.py [--batch 16] [--size 640]
"""
import argparse

PEAK_TFLOPS = 148e12
HBM = 347e9
LANE = 128


def ceil_to(x, m):
    return (x + m - 1) // m * m


def conv_cost(b, h, w, cin, cout, k, s, experts=1):
    """Returns (flops, bytes_real, bytes_padded) for one conv.
    Bytes: read input + write output in bf16 (weights negligible at
    bs=16; BN/SiLU fuse into the epilogue). ``experts``: DyConv runs the
    conv with the attention-mixed kernel — same conv FLOPs; the expert
    mixing itself is O(E * cout * cin * k * k) per image, negligible."""
    ho, wo = h // s, w // s
    flops = 2.0 * b * ho * wo * cout * cin * k * k
    def act_bytes(hh, ww, c, pad):
        c_eff = ceil_to(c, LANE) if pad else c
        return 2.0 * b * hh * ww * c_eff
    br = act_bytes(h, w, cin, False) + act_bytes(ho, wo, cout, False)
    bp = act_bytes(h, w, cin, True) + act_bytes(ho, wo, cout, True)
    return flops, br, bp


def walk(b, size, fold=False):
    """Yields (section, name, flops, bytes_real, bytes_padded) rows by
    interpreting the DyYOLO layer_config (params.yaml) with the exact
    channel/route semantics of models/interpreter.py.

    ``fold``: price the SHIPPED r4+ program — tokens [2:4] (B1 @H/2 +
    the 128-s2 downsample) run in ops/fold_early's 2x2-folded layout:
    every activation there carries >=128 lanes (padded == real bytes)
    but the block-structured kernels run dense (1x1 and 3x3-s1 at 4x
    FLOPs, the s2 exit at 16/9x). This is the folded program's OWN
    floor — the r2 698-fps roofline priced the unfolded layout."""
    from uavdet_tpu.utils.config import load_params
    cfg = load_params("params.yaml").model.hparams.layer_config

    h = w = size
    c = 3
    routes = []
    rows = []
    # Section cuts IDENTICAL to scripts/section_probe.py so the measured
    # and analytic columns line up: stem = the two pallas tokens; early
    # ends after the 256-s2 downsample; mid after the 512-s2 downsample;
    # deep = the rest (@40/@20 + FPN incl. its @80 tail + heads).
    sec = "stem"

    def res_block(section, h, w, c, n):
        for i in range(n):
            rows.append((section, f"res{c}@{h}.{i}a 1x1 {c}->{c//2}",
                         *conv_cost(b, h, w, c, c // 2, 1, 1)))
            rows.append((section, f"res{c}@{h}.{i}b 3x3 {c//2}->{c}",
                         *conv_cost(b, h, w, c // 2, c, 3, 1)))

    n_scale = 0
    for idx, tok in enumerate(cfg):
        if fold and idx == 2 and tok[0] == "B" and tok[1] == 1:
            # folded B1: (1,1,4c,2c) + (3,3,2c,4c) dense — 4x FLOPs,
            # lane-exact bytes (real == padded)
            for name, ci, co, k in ((f"FOLD res@{h//2} 1x1", 4 * c,
                                     2 * c, 1),
                                    (f"FOLD res@{h//2} 3x3", 2 * c,
                                     4 * c, 3)):
                fl, br, _ = conv_cost(b, h // 2, w // 2, ci, co, k, 1)
                rows.append((sec, name, fl, br, br))
            continue
        if fold and idx == 3 and tok[0] not in ("B", "S", "U", "DyConv") \
                and tok[2] == 2:
            # folded s2 exit: (2,2,4c,co) stride-1 — 16/9x FLOPs,
            # lane-exact; output is the ordinary @H/4 map
            out_c = tok[0]
            fl, br, _ = conv_cost(b, h // 2, w // 2, 4 * c, out_c, 2, 1)
            rows.append((sec, f"FOLD s2-exit@{h//2}", fl, br, br))
            h, w, c = h // 2, w // 2, out_c
            sec = "early"
            continue
        if tok[0] == "B":
            res_block(sec, h, w, c, tok[1])
            if tok[1] == 8:
                routes.append(c)
        elif tok[0] == "S":
            n_scale += 1
            res_block(sec, h, w, c, 1)
            rows.append((sec, f"S{n_scale} 1x1 {c}->{c//2}@{h}",
                         *conv_cost(b, h, w, c, c // 2, 1, 1)))
            rows.append((sec, f"S{n_scale} pred 3x3 {c//2}->{c}@{h}",
                         *conv_cost(b, h, w, c // 2, c, 3, 1)))
            c = c // 2
        elif tok[0] == "U":
            h, w = h * 2, w * 2
            rc = routes.pop()
            # upsample+concat: pure data movement, padded like any act
            fl, br, bp = conv_cost(b, h, w, c + rc, 1, 1, 1)
            rows.append((sec, f"U+concat -> {c+rc}@{h}", 0.0,
                         br - 2.0 * b * h * w, bp - 2.0 * b * h * w))
            c = c + rc
        elif tok[0] == "DyConv":
            out_c, k, s = tok[1:]
            rows.append((sec, f"DyConv {k}x{k} {c}->{out_c}@{h}s{s}",
                         *conv_cost(b, h, w, c, out_c, k, s, experts=4)))
            h, w, c = h // s, w // s, out_c
            if sec == "stem" and out_c == 64:
                sec = "early"        # past the two pallas stem tokens
        else:
            out_c, k, s = tok
            rows.append((sec, f"conv {k}x{k} {c}->{out_c}@{h}s{s}",
                         *conv_cost(b, h, w, c, out_c, k, s)))
            h, w, c = h // s, w // s, out_c
            if out_c == 256 and s == 2:
                sec = "mid"
            elif out_c == 512 and s == 2:
                sec = "deep"
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--per-layer", action="store_true")
    ap.add_argument("--fold", action="store_true",
                    help="price the shipped fold_early program (see walk)")
    args = ap.parse_args()
    rows = walk(args.batch, args.size, fold=args.fold)

    secs = {}
    for sec, name, fl, br, bp in rows:
        t_mxu = fl / PEAK_TFLOPS * 1e3
        t_floor = max(t_mxu, br / HBM * 1e3)
        t_ach = max(t_mxu, bp / HBM * 1e3)
        if args.per_layer:
            print(f"{sec:6s} {name:34s} mxu {t_mxu:6.3f} "
                  f"floor {t_floor:6.3f} ach {t_ach:6.3f} ms")
        a = secs.setdefault(sec, [0.0, 0.0, 0.0, 0.0, 0.0])
        a[0] += fl
        a[1] += br
        a[2] += bp
        a[3] += t_floor
        a[4] += t_ach
    print(f"\n{'section':8s} {'GFLOP':>8s} {'GB real':>8s} {'GB pad':>8s} "
          f"{'floor ms':>9s} {'achiev ms':>10s}")
    tot = [0.0] * 5
    for sec in ("stem", "early", "mid", "deep"):
        fl, br, bp, tf, ta = secs[sec]
        print(f"{sec:8s} {fl/1e9:8.1f} {br/1e9:8.3f} {bp/1e9:8.3f} "
              f"{tf:9.2f} {ta:10.2f}")
        for i, v in enumerate((fl, br, bp, tf, ta)):
            tot[i] += v
    print(f"{'total':8s} {tot[0]/1e9:8.1f} {tot[1]/1e9:8.3f} "
          f"{tot[2]/1e9:8.3f} {tot[3]:9.2f} {tot[4]:10.2f}")
    b = args.batch
    print(f"\nforward-only fps: floor {b / tot[3] * 1e3:6.1f} "
          f"achievable {b / tot[4] * 1e3:6.1f}")


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
