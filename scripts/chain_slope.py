#!/usr/bin/env python
"""TRUE in-context layer costs via slope measurement.

Isolated per-layer jits carry fixed launch/boundary costs that badly
overstate marginals at these shapes (PERF.md round 3: conv1+conv2
isolated 6.37 ms + conv3 3.35 vs the whole chain 6.66 in one jit).
The honest marginal of a layer is the SLOPE of total time in the number
of stacked copies — same tensor shapes in/out, fresh params per copy so
XLA can't CSE.

Measures: resblock(64)@320 slope (N=1,2,4) and the s2-downsample
marginal (rbN + conv3 vs rbN).

Usage: python scripts/chain_slope.py [--batch 16]
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
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    B, S = args.batch, args.size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, S, 64)) * 0.5, jnp.bfloat16)
    NMAX = 4
    k1s = [jnp.asarray(rng.normal(size=(1, 1, 64, 32)) * 0.1, jnp.bfloat16)
           for _ in range(NMAX)]
    k2s = [jnp.asarray(rng.normal(size=(3, 3, 32, 64)) * 0.1, jnp.bfloat16)
           for _ in range(NMAX)]
    k3 = jnp.asarray(rng.normal(size=(3, 3, 64, 128)) * 0.1, jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")

    def rb(a, i):
        z = jax.lax.conv_general_dilated(a, k1s[i], (1, 1),
                                         [(0, 0), (0, 0)],
                                         dimension_numbers=dn)
        z = jnp.maximum(z, 0.1 * z)
        f = jax.lax.conv_general_dilated(z, k2s[i], (1, 1),
                                         [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
        return jnp.maximum(f, 0.1 * f) + a

    def t(name, fn):
        f = jax.jit(fn)
        dt = _timer(lambda: f(x),
                    lambda o: float(o.astype(jnp.float32)[0, 0, 0, 0]),
                    iters=args.iters)
        print(f"{name:<44s} {dt * 1e3:8.3f} ms", flush=True)
        return dt

    times = {}
    for n in (1, 2, 4):
        def fn(a, n=n):
            for i in range(n):
                a = rb(a, i)
            return a
        times[n] = t(f"rb x{n} (one jit)", fn)

    slope12 = (times[2] - times[1])
    slope24 = (times[4] - times[2]) / 2
    print(f"  resblock marginal: {slope12 * 1e3:.3f} ms (1→2)  "
          f"{slope24 * 1e3:.3f} ms (2→4)/copy", flush=True)

    def rb1_down(a):
        a = rb(a, 0)
        o = jax.lax.conv_general_dilated(a, k3, (2, 2), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
        return jnp.maximum(o, 0.1 * o)
    td = t("rb x1 + s2 downsample (one jit)", rb1_down)
    print(f"  downsample marginal: {(td - times[1]) * 1e3:.3f} ms",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
