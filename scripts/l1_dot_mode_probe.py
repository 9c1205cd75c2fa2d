#!/usr/bin/env python
"""Kernel-A dot-decomposition probe (VERDICT r4 item 3b).

Parity + standalone timing of pallas_l1's three dot modes on real
hardware, then the end-to-end bench delta is measured separately via
  UAVDET_L1_DOT_MODE=N python bench.py

Modes (make_l1_kernel): 0 rank-3 rhs (shipped) · 1 rank-2 pre-flattened
rhs · 2 one block-diagonal (128,112)@(112, HALF·WB) M-stacked dot.
All three must be BITWISE-equal (mode 1 reassociates nothing; mode 2
adds exact zeros to the f32 accumulation).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from uavdet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from uavdet_tpu.ops.pallas_stem_split import pallas_l1

B, H, W = 16, 640, 640
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), np.uint8))
k1 = jnp.asarray(rng.normal(0, 0.05, (B, 32, 28)).astype(np.float32))


def run(mode):
    f = jax.jit(lambda x, k: pallas_l1(x, k, dot_mode=mode))
    banks, sums = f(x, k1)
    # sync by value fetch (block_until_ready lies on axon)
    float(jnp.sum(sums))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        banks, sums = f(x, k1)
    s = float(jnp.sum(sums))
    dt = (time.perf_counter() - t0) / n
    return banks, sums, dt, s


b0, s0, t0_, _ = run(0)
print(f"mode 0 (rank-3 rhs):        {t0_ * 1e3:8.3f} ms")
for mode in (1, 2):
    bm, sm, tm, _ = run(mode)
    n_bad, n_tot, worst = 0, 0, 0.0
    for q in range(4):
        # compare REAL lanes/rows only (pad lanes are uninitialized)
        a = np.asarray(b0[q][:, :, :H // 2, :W // 2], np.float32)
        c = np.asarray(bm[q][:, :, :H // 2, :W // 2], np.float32)
        n_bad += int((a != c).sum())
        n_tot += a.size
        if n_bad:
            worst = max(worst, float(np.abs(a - c).max()))
    sums_eq = bool((np.asarray(s0) == np.asarray(sm)).all())
    tag = ("bitwise-equal" if n_bad == 0 and sums_eq else
           f"{n_bad}/{n_tot} one-ULP flips (reassociation), "
           f"max abs {worst:g}, sums_eq={sums_eq}")
    print(f"mode {mode}: {tm * 1e3:8.3f} ms  ({tag})")
    if mode == 1 and (n_bad or not sums_eq):
        raise SystemExit("mode 1 must be bitwise-equal")
