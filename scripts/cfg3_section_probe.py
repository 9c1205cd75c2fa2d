#!/usr/bin/env python
"""Per-SECTION in-context costs of the cfg3 program (DySOEM_SimFPN
bs=32 @1280, folded stem + s2d-as-conv SOEMs) — the same cumulative-
prefix methodology as scripts/section_probe.py (isolated layer timings
overestimate; only same-program deltas are trustworthy, PERF.md r3).

Sections:
  front    fold_input_stem: uint8 -> (B, 640, 640, 128)   [= t(P0)]
  soem_0   skip_s2d DynamicSOEM  -> (B, 640, 640, 64)     [= t(P1)-t(P0)]
  soem_1   fused s2d-as-conv     -> (B, 320, 320, 128)    [= t(P2)-t(P1)]
  soem_2   fused s2d-as-conv     -> (B, 160, 160, 256)    [= t(P3)-t(P2)]
  neck+head SimplifiedFPN + YOLOHead                      [= t(P4)-t(P3)]
  post     decode + chunked top-k + NMS                   [= full - t(P4)]

Usage: python scripts/cfg3_section_probe.py [--batch 32] [--iters 6]
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
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from uavdet_tpu.inference import make_detector
    from uavdet_tpu.models import build_model
    from uavdet_tpu.models.dysoem_simfpn import (DynamicSOEM, SimplifiedFPN,
                                                 fold_input_stem)
    from uavdet_tpu.models.layers import YOLOHead
    from uavdet_tpu.utils.config import load_config

    B, S = args.batch, args.input
    cfg = load_config("conf", model="dy-soem_fpn")
    hparams = cfg.model.hparams
    model = build_model("DySOEM_SimFPN", hparams, dtype=jnp.bfloat16)
    x_init = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_init, train=False)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(B, S, S, 3), dtype=np.uint8))

    def t(name, run, sync):
        dt = _timer(run, sync, iters=args.iters, warmup=2)
        print(f"{name:<44s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    det = make_detector(model, hparams, S, pallas_stem_variables=variables)
    t_full = t("detect FULL (folded stem, one program)",
               lambda: det(variables, imgs),
               lambda o: float(jnp.sum(o.scores)))

    front = fold_input_stem(variables, dtype=jnp.bfloat16)

    class Prefix(nn.Module):
        """front + the first ``n`` SOEMs (+ neck+head when full)."""
        n: int
        with_head: bool = False

        @nn.compact
        def __call__(self, x):
            feats = []
            for i in range(self.n):
                x = DynamicSOEM(x.shape[-1], num_dy_conv=3,
                                skip_s2d=(i == 0), s2d_conv=True,
                                name=f"soem_{i}", dtype=jnp.bfloat16)(
                    x, model.attn_temperature, False)
                feats.append(x)
            if not self.with_head:
                return x
            f = SimplifiedFPN(name="neck", dtype=jnp.bfloat16)(feats, False)
            return YOLOHead(model.n_anchors, 3, dtype=jnp.bfloat16,
                            name="yolo_head")(list(f))

    def sync_det(o):
        return float(o[0].obj.astype(jnp.float32).sum()) \
            if isinstance(o, (list, tuple)) else \
            float(o[0, 0, 0, 0].astype(jnp.float32))

    # Each prefix program runs front IN-PROGRAM from the uint8 input —
    # true same-program prefixes (the r3 methodology), and the 3.4 GB
    # front output (32x640x640x128 bf16) is never held live across
    # programs (holding it OOMed the first version of this probe).
    front_j = jax.jit(lambda u8: jnp.sum(front(u8).astype(jnp.float32)))
    times = {"P0 (front)": t("P0 front (fold_input_stem)",
                             lambda: front_j(imgs),
                             lambda o: float(o))}

    xf1 = jax.jit(front)(imgs[:1])  # init-shape sample only
    for n, with_head in ((1, False), (2, False), (3, False), (3, True)):
        name = f"P{n} (front+{n} soems" + \
            ("+neck+head)" if with_head else ")")
        mod = Prefix(n=n, with_head=with_head)
        vs = mod.init(jax.random.key(1), xf1)
        fn = jax.jit(lambda v, u8, mod=mod: mod.apply(v, front(u8)))
        times[name] = t(name, lambda: fn(vs, imgs), sync_det)

    p = list(times.values())
    print("\n--- cfg3 section table (ms, in-context deltas) ---")
    print(f"front     {p[0] * 1e3:8.2f}")
    print(f"soem_0    {(p[1] - p[0]) * 1e3:8.2f}")
    print(f"soem_1    {(p[2] - p[1]) * 1e3:8.2f}")
    print(f"soem_2    {(p[3] - p[2]) * 1e3:8.2f}")
    print(f"neck+head {(p[4] - p[3]) * 1e3:8.2f}")
    print(f"post      {(t_full - p[4]) * 1e3:8.2f}   (= full - P4)")
    print(f"full      {t_full * 1e3:8.2f}")


if __name__ == "__main__":
    main()
