#!/usr/bin/env python
"""Per-SECTION in-context costs of the SHIPPED cfg3 program (r5:
folded stem + row-folded neck + per-sample dyconv Pallas SOEMs) —
same cumulative-prefix methodology as scripts/cfg3_section_probe.py,
but the prefixes are real truncations of the ONE folded forward
(``fold_soem_neck_forward(..., stop_after=...)``), so every delta is a
same-program number.

Usage: python scripts/cfg3_dyconv_section_probe.py [--batch 32]
       [--iters 6] [--no-dyconv]
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
    ap.add_argument("--no-dyconv", action="store_true")
    args = ap.parse_args()

    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from uavdet_tpu.inference import make_detector
    from uavdet_tpu.models import build_model
    from uavdet_tpu.ops.fold_soem_neck import fold_soem_neck_forward
    from uavdet_tpu.utils.config import load_config

    B, S = args.batch, args.input
    cfg = load_config("conf", model="dy-soem_fpn")
    hparams = cfg.model.hparams
    model = build_model("DySOEM_SimFPN", hparams, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, S, S, 3), jnp.float32),
                           train=False)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(B, S, S, 3), dtype=np.uint8))
    dyconv = not args.no_dyconv

    def t(name, run, sync):
        dt = _timer(run, sync, iters=args.iters, warmup=2)
        print(f"{name:<44s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    if dyconv:
        os.environ.pop("UAVDET_SOEM_DYCONV", None)
    else:
        os.environ["UAVDET_SOEM_DYCONV"] = "0"
    det = make_detector(model, hparams, S,
                        pallas_stem_variables=variables)
    t_full = t("detect FULL (one program)",
               lambda: det(variables, imgs),
               lambda o: float(o.scores.astype(jnp.float32).sum()))

    def sync_any(o):
        lead = o[0] if isinstance(o, (list, tuple)) else o
        lead = getattr(lead, "obj", lead)
        return float(lead.astype(jnp.float32).ravel()[0])

    times = []
    for sec in ("front", "soem_0", "soem_1", "soem_2", "fpn_x0",
                "conv_out", None):
        fn = fold_soem_neck_forward(model, variables, dyconv=dyconv,
                                    stop_after=sec)
        assert fn is not None
        nm = sec or "neck+head (full fwd)"
        if sec in ("front", "soem_0", "fpn_x0", "conv_out"):
            # the big maps (3.35 / 1.67 GB) can't be held live next to
            # the full program's buffers — reduce in-program (the sum
            # reads the output once; noted as part of the prefix cost)
            jfn = jax.jit(lambda u8, fn=fn: sum(
                jnp.sum(o.astype(jnp.float32))
                for o in jax.tree_util.tree_leaves(fn(u8))))
            times.append(t(f"prefix through {nm} (+out sum)",
                           lambda: jfn(imgs), lambda o: float(o)))
        else:
            jfn = jax.jit(fn)
            times.append(t(f"prefix through {nm}",
                           lambda: jfn(imgs), sync_any))

    p = times
    print("\n--- cfg3 SHIPPED-program section table (ms, in-context "
          f"deltas, dyconv={dyconv}) ---")
    print(f"front       {p[0] * 1e3:8.2f}")
    print(f"soem_0      {(p[1] - p[0]) * 1e3:8.2f}")
    print(f"soem_1      {(p[2] - p[1]) * 1e3:8.2f}")
    print(f"soem_2      {(p[3] - p[2]) * 1e3:8.2f}")
    print(f"fpn->x0     {(p[4] - p[3]) * 1e3:8.2f}")
    print(f"conv_outs   {(p[5] - p[4]) * 1e3:8.2f}")
    print(f"rest of fwd {(p[6] - p[5]) * 1e3:8.2f}")
    print(f"post        {(t_full - p[6]) * 1e3:8.2f}   (= full - fwd)")


if __name__ == "__main__":
    main()
