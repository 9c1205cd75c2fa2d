#!/usr/bin/env python
"""Kernel-level stem timings (pallas_l1 / pallas_l2 / fused, uint8 path).

Finer-grained than perf_probe's whole-stem number: times the L1 kernel
(with its XLA-side parity-split caller), the split construction alone,
and the L2 kernel, so kernel-internal changes are attributable.

Usage: python scripts/stem_probe.py [--batch 16] [--input 640]
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
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from uavdet_tpu.ops.pallas_stem_split import pallas_l1, pallas_l2

    B, S = args.batch, args.input
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, size=(B, S, S, 3),
                                 dtype=np.uint8))
    k1 = jnp.asarray(rng.normal(size=(B, 32, 28)) * 0.05, jnp.bfloat16)
    k2 = jnp.asarray(rng.normal(size=(B, 64, 289)) * 0.05, jnp.bfloat16)

    def t(name, run, sync):
        dt = _timer(run, sync, iters=args.iters)
        print(f"{name:<44s} {dt * 1e3:8.3f} ms", flush=True)

    # the XLA-side quad-parity-split construction alone (what pallas_l1's
    # caller half costs; planes stay uint8 like the real caller's)
    wq = S // 2
    wq_pad = -(-(wq + 2) // 128) * 128
    n_a = -(-S // 128)

    @jax.jit
    def split_only(xx):
        x5 = xx.reshape(B, S, wq, 2, 3).transpose(0, 3, 4, 1, 2)
        pads = {0: (8, 64 * n_a + 8 - (S + 1) // 2),
                1: (8, 64 * n_a - S // 2)}
        return tuple(
            jnp.pad(x5[:, g_, :, p_::2, :],
                    ((0, 0), (0, 0), pads[p_], (1, wq_pad - wq - 1)))
            for p_ in (0, 1) for g_ in (0, 1))

    t("quad-split construction (XLA)", lambda: split_only(x),
      lambda o: float(o[0][0, 0, 8, 1].astype(jnp.float32)))

    t("pallas_l1 (kernel A, incl. split)", lambda: pallas_l1(x, k1),
      lambda o: float(o[1][0, 0]))

    xl1, _ = jax.block_until_ready(pallas_l1(x, k1))
    t("pallas_l2 (kernel B)", lambda: pallas_l2(xl1, k2, h=S, wq=S // 2),
      lambda o: float(o[0, 0, 0, 0].astype(jnp.float32)))
    t("pallas_l2 (kernel B, raw_cm)",
      lambda: pallas_l2(xl1, k2, h=S, wq=S // 2, over_rows=8, raw_cm=True),
      lambda o: float(o[0, 0, 0, 0].astype(jnp.float32)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
