#!/usr/bin/env python
"""Per-SECTION in-context costs of the bs=16 @640 detect program
(VERDICT r4 item 3a — the measured column of PERF.md's achievable table).

Methodology = the r3 decomposition (PERF.md round-3 header): each piece
its own jit at in-context shapes, value-fetch sync; the tail is split by
CUMULATIVE PREFIX programs so each section's number is a delta of two
real programs, not an isolated layer timing (which overestimates —
scripts/chain_slope.py).

Sections (cuts at layer_config token boundaries):
  stem   pallas L1+L2 (tokens 0-1)               [measured directly]
  early  B1@320 + 128s2 + B2@160 + 256s2         [= t(P1)]
  mid    B8@80 + 512s2                           [= t(P2) - t(P1)]
  deep   B8@40 .. heads (incl. the @80 FPN tail) [= t(tail) - t(P2)]
  post   decode_topk + top_k + NMS               [measured directly]

Prefix programs use FRESH params (cost is shape-determined); the full
tail uses the real stem-split tail for an apples-to-apples total.

Usage: python scripts/section_probe.py [--batch 16] [--iters 20]
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--input", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fold", action="store_true",
                    help="audit the SHIPPED post-fold program (VERDICT"
                    " r4 item 2): stem emits the parity-folded layout,"
                    " the early section runs ops/fold_early's"
                    " block-structured convs, the tail starts at mid")
    args = ap.parse_args()

    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from uavdet_tpu.inference import make_detector
    from uavdet_tpu.models import build_model
    from uavdet_tpu.models.layers import (CNNBlock, DyConvModule,
                                          ResidualBlock)
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
        print(f"{name:<44s} {dt * 1e3:8.2f} ms")
        return dt

    # full program + stem + tail (the r3 trio, re-measured on today's code)
    det = make_detector(model, hparams, S, pallas_stem_variables=variables,
                        fold_early=args.fold)
    t_full = t(f"detect FULL (pallas stem, fold={args.fold})",
               lambda: det(variables, imgs),
               lambda o: float(jnp.sum(o.scores)))

    from uavdet_tpu.ops.pallas_stem_split import detector_stem_fast_path
    stem_fn, tail_model, tail_vars = detector_stem_fast_path(
        model, variables, model.layer_config,
        getattr(model, "attn_temperature", 30.0), fold_early=args.fold)
    stem_j = jax.jit(stem_fn)
    t_stem = t("stem+earlyfold" if args.fold else
               "stem (pallas L1+L2, from uint8)",
               lambda: stem_j(imgs),
               lambda o: float(o[0, 0, 0, 0].astype(jnp.float32)))
    t_stem_only = None
    if args.fold:
        # the pallas kernels alone, emitting the folded layout (no
        # early_fn) — the early-fold delta prices ops/fold_early
        from uavdet_tpu.ops.pallas_stem_split import fused_stem_forward
        p_net = variables["params"]["net"]
        s_net = variables["batch_stats"]["net"]
        at = getattr(model, "attn_temperature", 30.0)
        stem_only_j = jax.jit(lambda x: fused_stem_forward(
            x, p_net["DyConvModule_0"], s_net["DyConvModule_0"],
            p_net["DyConvModule_1"], s_net["DyConvModule_1"], at,
            folded=True))
        t_stem_only = t("stem only (pallas, folded out)",
                        lambda: stem_only_j(imgs),
                        lambda o: float(o[0, 0, 0, 0]
                                        .astype(jnp.float32)))
    xstem = stem_j(imgs)
    _ = np.asarray(jnp.ravel(xstem)[:1])

    tail_j = jax.jit(lambda v, z: tail_model.apply(v, z, train=False))
    t_tail = t("tail (all post-stem layers + heads)",
               lambda: tail_j(tail_vars, xstem),
               lambda o: float(o[0].obj.astype(jnp.float32).sum()))

    # --- cumulative tail prefixes -----------------------------------------

    class TailPrefix(nn.Module):
        tokens: tuple

        @nn.compact
        def __call__(self, x):
            routes = []
            for tok in self.tokens:
                if tok[0] == "B":
                    x = ResidualBlock(x.shape[-1], num_repeats=tok[1],
                                      dtype=jnp.bfloat16)(x, False)
                    if tok[1] == 8:
                        routes.append(x)
                elif tok[0] == "S":
                    x = ResidualBlock(x.shape[-1], use_residual=False,
                                      num_repeats=1,
                                      dtype=jnp.bfloat16)(x, False)
                    x = CNNBlock(x.shape[-1] // 2, kernel_size=(1, 1),
                                 dtype=jnp.bfloat16)(x, False)
                elif tok[0] == "U":
                    from uavdet_tpu.models.layers import upsample2x
                    x = jnp.concatenate([upsample2x(x), routes.pop()],
                                        axis=-1)
                elif tok[0] == "DyConv":
                    x = DyConvModule(tok[1], kernel_size=tok[2],
                                     stride=tok[3],
                                     padding=1 if tok[2] == 3 else 0,
                                     dtype=jnp.bfloat16)(x, 30.0, False)
                else:
                    c, k, s = tok
                    x = CNNBlock(c, kernel_size=(k, k), stride=(s, s),
                                 padding=1 if k == 3 else 0,
                                 dtype=jnp.bfloat16)(x, False)
            return x

    toks = [tuple(tk) for tk in model.layer_config[4 if args.fold else 2:]]
    # early ends after the 256-s2 downsample (first token whose out_c=256)
    cut_early = next(i for i, tk in enumerate(toks)
                     if tk[0] not in ("B", "S", "U", "DyConv")
                     and tk[0] == 256) + 1
    # mid ends after the 512-s2 downsample
    cut_mid = next(i for i, tk in enumerate(toks)
                   if tk[0] not in ("B", "S", "U", "DyConv")
                   and tk[0] == 512) + 1

    xin = jnp.asarray(np.asarray(xstem))  # tail input, bf16
    prefix_t = {}
    for name, cut in (("P1 (early: ..@160+256s2)", cut_early),
                      ("P2 (early+mid: ..@80+512s2)", cut_mid)):
        if args.fold and cut == cut_early:
            name = "P1 (early rest: B2@160+256s2)"
        mod = TailPrefix(tokens=tuple(toks[:cut]))
        vs = mod.init(jax.random.key(1), xin)
        fn = jax.jit(lambda v, z, mod=mod: mod.apply(v, z))
        prefix_t[name] = t(name, lambda: fn(vs, xin),
                           lambda o: float(o[0, 0, 0, 0]
                                           .astype(jnp.float32)))

    p1 = next(v for k, v in prefix_t.items() if k.startswith("P1"))
    p2 = prefix_t["P2 (early+mid: ..@80+512s2)"]
    post = t_full - t_stem - t_tail
    print("\n--- section table (ms, in-context deltas) ---")
    if args.fold:
        print(f"stem        {t_stem_only * 1e3:7.2f}")
        print(f"early-fold  {(t_stem - t_stem_only) * 1e3:7.2f}"
              "   (folded B1@H/2 + 128s2, ops/fold_early)")
        print(f"early-rest  {p1 * 1e3:7.2f}   (B2@160 + 256s2)")
    else:
        print(f"stem   {t_stem * 1e3:7.2f}")
        print(f"early  {p1 * 1e3:7.2f}")
    print(f"mid    {(p2 - p1) * 1e3:7.2f}")
    print(f"deep   {(t_tail - p2) * 1e3:7.2f}")
    print(f"post   {post * 1e3:7.2f}   (= full - stem - tail)")
    print(f"sum    {(t_stem + t_tail + post) * 1e3:7.2f}  "
          f"vs full {t_full * 1e3:7.2f}")


if __name__ == "__main__":
    main()
