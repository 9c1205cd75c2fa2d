#!/usr/bin/env python
"""End-to-end A/B of the parity-folded early stage (ops/fold_early).

Arm A: pallas stem -> tail (shipped path).
Arm B: pallas stem (folded cm output) -> folded B1 + 128-s2 -> tail2.

Both arms are ONE jit program (stem+tail composed) at the headline
workload — the only measurement the repo's methodology trusts
(PERF.md: isolated timings overestimate; same-program end-to-end
deltas only).

Usage: python scripts/fold_early_probe.py [--batch 16] [--iters 30]
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
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from uavdet_tpu.models import build_model
    from uavdet_tpu.ops.pallas_stem_split import detector_stem_fast_path
    from uavdet_tpu.utils.config import load_params

    B, S = args.batch, args.input
    cfg = load_params("params.yaml")
    model = build_model(cfg.model.name, cfg.model.hparams,
                        dtype=jnp.bfloat16)
    x0 = jnp.zeros((B, S, S, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(B, S, S, 3), dtype=np.uint8))

    arms = {}
    outs = {}
    for name, fold in (("A plain", False), ("B folded", True)):
        stem_fn, tail, tvars = detector_stem_fast_path(
            model, variables, model.layer_config,
            getattr(model, "attn_temperature", 30.0), fold_early=fold)
        fn = jax.jit(lambda x, t=tail, v=tvars, s=stem_fn:
                     t.apply(v, s(x), train=False))
        dt = _timer(lambda: fn(imgs),
                    lambda o: float(o[0].obj.astype(jnp.float32).sum()),
                    iters=args.iters)
        arms[name] = dt
        outs[name] = fn(imgs)
        print(f"{name:10s} stem+tail  {dt * 1e3:8.2f} ms "
              f"({B / dt:6.1f} fps fwd-only)")

    d = (arms["A plain"] - arms["B folded"]) * 1e3
    print(f"delta      {d:+8.2f} ms  "
          f"({'folded WINS' if d > 0.15 else 'folded LOSES' if d < -0.15 else 'neutral'})")

    # numerical sanity: same detections up to bf16 reassociation
    for a, b in zip(jax.tree.leaves(outs["A plain"]),
                    jax.tree.leaves(outs["B folded"])):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        bad = np.mean(~np.isclose(a, b, rtol=0.05, atol=0.05))
        print(f"  head leaf {a.shape}: frac|diff|>tol {bad:.2e} "
              f"max abs diff {np.max(np.abs(a - b)):.3g}")


if __name__ == "__main__":
    main()
