#!/usr/bin/env python
"""Per-segment / per-layer timing probe for the DyYOLO inference pipeline.

Times each piece of the end-to-end detector (preproc, Pallas stem, every
backbone/FPN layer shape, decode+NMS) as its own jitted program on the
real chip, so optimization effort lands where the milliseconds are.

Sync caveat: on the tunneled 'axon' platform block_until_ready returns
early; every timing fetches a value to the host (see bench.py::_timer).

Usage: python scripts/perf_probe.py [--batch 16] [--input 640] [--layers]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from uavdet_tpu.utils.timing import time_per_iter as _timer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--input", type=int, default=640)
    ap.add_argument("--layers", action="store_true",
                    help="per-layer-shape breakdown (many compiles)")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from uavdet_tpu.inference import make_detector, preprocess
    from uavdet_tpu.models import build_model
    from uavdet_tpu.utils.config import load_params

    B, S = args.batch, args.input
    cfg = load_params("params.yaml")
    hparams = cfg.model.hparams
    model = build_model(cfg.model.name, hparams, dtype=jnp.bfloat16)
    x0 = jnp.zeros((B, S, S, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(B, S, S, 3), dtype=np.uint8))

    def t(name, run, sync):
        dt = _timer(run, sync, iters=args.iters)
        print(f"{name:<46s} {dt * 1e3:8.2f} ms   "
              f"({B / dt:8.1f} fps)")
        return dt

    # --- full pipeline -----------------------------------------------------
    det_pallas = make_detector(model, hparams, S,
                               pallas_stem_variables=variables)
    det_xla = make_detector(model, hparams, S)
    t("detect (pallas stem)", lambda: det_pallas(variables, imgs),
      lambda o: float(jnp.sum(o.scores)))
    t("detect (pure XLA)", lambda: det_xla(variables, imgs),
      lambda o: float(jnp.sum(o.scores)))

    # --- segments ----------------------------------------------------------
    pre = jax.jit(lambda im: preprocess(im, S, jnp.bfloat16))
    t("preprocess", lambda: pre(imgs), lambda o: float(o[0, 0, 0, 0]))

    from uavdet_tpu.ops.pallas_stem_split import detector_stem_fast_path
    stem = detector_stem_fast_path(
        model, variables, model.layer_config,
        getattr(model, "attn_temperature", 30.0))
    xpre = pre(imgs)
    xpre = jax.block_until_ready(xpre)
    if stem is not None:
        stem_fn, tail_model, tail_vars = stem
        stem_j = jax.jit(stem_fn)
        t("stem (pallas fused)", lambda: stem_j(xpre),
          lambda o: float(o[0, 0, 0, 0].astype(jnp.float32)))
        xstem = jax.block_until_ready(stem_j(xpre))

        tail_j = jax.jit(lambda v, z: tail_model.apply(v, z, train=False))
        t("tail (all layers after stem)",
          lambda: tail_j(tail_vars, xstem),
          lambda o: float(o[0].obj.astype(jnp.float32).sum()))

    # XLA stem alone: a 2-layer model over the stem tokens
    from uavdet_tpu.models.dy_yolo import DyYOLO
    cfg2 = [list(tk) for tk in model.layer_config[:2]]
    if cfg2 == [["DyConv", 32, 3, 1], ["DyConv", 64, 3, 2]]:
        from uavdet_tpu.models.layers import DyConvModule
        p = variables["params"]["net"]
        st = variables["batch_stats"]["net"]
        m0 = DyConvModule(32, 3, 1, 1, dtype=jnp.bfloat16)
        m1 = DyConvModule(64, 3, 2, 1, dtype=jnp.bfloat16)

        @jax.jit
        def xla_stem(x):
            y = m0.apply({"params": p["DyConvModule_0"],
                          "batch_stats": st["DyConvModule_0"]}, x, 30.0,
                         False)
            return m1.apply({"params": p["DyConvModule_1"],
                             "batch_stats": st["DyConvModule_1"]}, y, 30.0,
                            False)

        t("stem (pure XLA)", lambda: xla_stem(xpre),
          lambda o: float(o[0, 0, 0, 0].astype(jnp.float32)))

    # decode + NMS on frozen forward outputs
    outs = jax.block_until_ready(
        jax.jit(lambda v, z: model.apply(v, z, train=False))(
            variables, xpre))
    from uavdet_tpu.inference import decode_all_heads
    from uavdet_tpu.ops.nms import nms
    anchors = np.asarray(hparams.anchors, np.float32)

    @jax.jit
    def post(outs):
        scales = tuple(S // o.obj.shape[2] for o in outs)
        boxes, scores = decode_all_heads(outs, anchors, scales,
                                         str(hparams.bbox_loss_fn))
        scores = jnp.where(scores >= 0.001, scores, -jnp.inf)

        def per_image(bx, sc):
            top_sc, top_i = jax.lax.top_k(sc, 512)
            keep, _, _ = nms(bx[top_i], top_sc, 0.5, 300)
            return jnp.where(keep >= 0, top_sc[jnp.maximum(keep, 0)], 0.0)

        return jax.vmap(per_image)(boxes, scores)

    t("decode+topk+NMS (full-grid decode)", lambda: post(outs),
      lambda o: float(jnp.sum(o)))

    from uavdet_tpu.inference import decode_topk_heads

    @jax.jit
    def post_topk(outs):
        scales = tuple(S // o.obj.shape[2] for o in outs)
        boxes, scores = decode_topk_heads(outs, anchors, scales, 512)
        scores = jnp.where(scores >= 0.001, scores, -jnp.inf)

        def per_image(bx, sc):
            top_sc, top_i = jax.lax.top_k(sc, 512)
            keep, _, _ = nms(bx[top_i], top_sc, 0.5, 300)
            return jnp.where(keep >= 0, top_sc[jnp.maximum(keep, 0)], 0.0)

        return jax.vmap(per_image)(boxes, scores)

    t("decode+topk+NMS (logit-topk decode)", lambda: post_topk(outs),
      lambda o: float(jnp.sum(o)))

    if not args.layers:
        return 0

    # --- per-layer shapes ----------------------------------------------------
    print("\nper-layer (fresh params, bf16, NHWC):")
    from uavdet_tpu.models.layers import (CNNBlock, DyConvModule,
                                          ResidualBlock)

    sz = S
    chan = 64
    sz //= 2  # after stem
    specs = []
    for tok in model.layer_config[2:]:
        if tok[0] == "B":
            specs.append(("B", int(tok[1]), chan, sz))
        elif tok[0] == "S":
            specs.append(("S", None, chan, sz))
            chan //= 2
        elif tok[0] == "U":
            specs.append(("U", None, chan, sz))
            sz *= 2
            chan *= 3
        elif tok[0] == "DyConv":
            specs.append(("DyConv", tuple(tok[1:]), chan, sz))
            chan = int(tok[1])
        else:
            c, k, s = (int(v) for v in tok)
            specs.append(("C", (c, k, s), chan, sz))
            chan = c
            if s == 2:
                sz //= 2

    total = 0.0
    for kind, info, in_c, in_sz in specs:
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(B, in_sz, in_sz, in_c)).astype(np.float32),
            jnp.bfloat16)
        if kind == "B":
            mod = ResidualBlock(in_c, num_repeats=info, dtype=jnp.bfloat16)
            name = f"B x{info} @{in_sz} c{in_c}"
            vs = mod.init(jax.random.key(0), x, False)
            fn = jax.jit(lambda v, z, mod=mod: mod.apply(v, z, False))
        elif kind == "C":
            c, k, s = info
            mod = CNNBlock(c, kernel_size=(k, k), stride=(s, s),
                           padding=1 if k == 3 else 0, dtype=jnp.bfloat16)
            name = f"CNN {in_c}->{c} k{k} s{s} @{in_sz}"
            vs = mod.init(jax.random.key(0), x, False)
            fn = jax.jit(lambda v, z, mod=mod: mod.apply(v, z, False))
        elif kind == "DyConv":
            c, k, s = info
            mod = DyConvModule(c, kernel_size=k, stride=s,
                               padding=1 if k == 3 else 0,
                               dtype=jnp.bfloat16)
            name = f"DyConv {in_c}->{c} k{k} s{s} @{in_sz}"
            vs = mod.init(jax.random.key(0), x, 30.0, False)
            fn = jax.jit(lambda v, z, mod=mod: mod.apply(v, z, 30.0, False))
        elif kind == "S":
            # ResidualBlock(no-skip) + 1x1 half + ScalePrediction
            from uavdet_tpu.models.layers import ScalePrediction

            class SBlock(__import__("flax").linen.Module):
                c: int

                @__import__("flax").linen.compact
                def __call__(self, z):
                    z = ResidualBlock(self.c, use_residual=False,
                                      num_repeats=1,
                                      dtype=jnp.bfloat16)(z, False)
                    z = CNNBlock(self.c // 2, kernel_size=(1, 1),
                                 dtype=jnp.bfloat16)(z, False)
                    return ScalePrediction(self.c // 2,
                                           dtype=jnp.bfloat16)(z, False)

            mod = SBlock(in_c)
            name = f"S @{in_sz} c{in_c}"
            vs = mod.init(jax.random.key(0), x)
            fn = jax.jit(lambda v, z, mod=mod: mod.apply(v, z))
        else:  # U
            name = f"U @{in_sz} c{in_c}"
            vs = {}
            from uavdet_tpu.models.layers import upsample2x
            fn = jax.jit(lambda v, z: upsample2x(z))

        dt = t(name, lambda: fn(vs, x),
               lambda o: float(o.astype(jnp.float32)[0, 0, 0, 0]))
        total += dt
    print(f"{'sum of layers':<46s} {total * 1e3:8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
