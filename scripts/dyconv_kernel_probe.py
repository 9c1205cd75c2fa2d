#!/usr/bin/env python
"""Per-sample dynamic-conv Pallas kernel: TPU parity + timing at the
three cfg3 SOEM sites vs the stacked-experts XLA form it replaces.

For each site (s2d-formulation shapes at bs=32 @1280):
  soem_0:  x (32, 640, 640, 128) -> (.., 64→ padded out)  [C_out 64 <
           128 lanes: measured anyway — the out write pads 2x]
  soem_1:  x (32, 320, 320, 256) -> (.., 128)
  soem_2:  x (32, 160, 160, 512) -> (.., 256)

Baselines per site, all one jit program, value-fetch sync:
  stacked: conv(x, K_stacked (3,3,C,E·Co)) + bias -> 5D reshape ->
           einsum contraction -> affine+silu  (the stock DynamicSOEM)
  kernel:  mix kernels in XLA (einsum, negligible) -> pallas_dyconv

Parity on hardware: kernel vs interpret (bitwise expected) on a small
shape, and kernel vs the stacked XLA form at one real site (bf16
tolerance).

Usage: python scripts/dyconv_kernel_probe.py [--iters 10] [--rs 16]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rs", type=int, default=16)
    ap.add_argument("--sites", default="0,1,2")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from uavdet_tpu.ops.pallas_dyconv import (mixed_bias, mixed_kernel,
                                              pallas_dyconv)

    E = 3
    rng = np.random.default_rng(0)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # ---------------- parity on hardware ---------------------------------
    if not args.skip_parity:
        B, H, W, C, CO = 2, 32, 32, 128, 128
        x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32),
                        jnp.bfloat16)
        km = jnp.asarray(rng.normal(size=(B, 9, C, CO)).astype(
            np.float32) * 0.1, jnp.bfloat16)
        mul = jnp.asarray(rng.uniform(0.5, 1.5, (CO,)), jnp.float32)
        add = jnp.asarray(rng.normal(size=(B, CO)), jnp.float32)
        got = np.asarray(pallas_dyconv(x, km, mul, add, rs=8))
        ref = np.asarray(pallas_dyconv(x, km, mul, add, rs=8,
                                       interpret=True))
        n_diff = int((got != ref).sum())
        print(f"parity TPU-vs-interpret: {n_diff} mismatched elements "
              f"of {ref.size} (expect 0)")
        assert n_diff == 0

    # ---------------- timing at the SOEM sites ---------------------------
    SITES = {0: (32, 640, 128, 64), 1: (32, 320, 256, 128),
             2: (32, 160, 512, 256)}

    def t(name, run, sync):
        dt = _timer(run, sync, iters=args.iters)
        print(f"{name:<44s} {dt * 1e3:8.2f} ms")
        return dt

    for site in [int(s) for s in args.sites.split(",")]:
        B, HW, C, CO = SITES[site]
        x = jnp.asarray(rng.normal(size=(B, HW, HW, C)).astype(
            np.float32), jnp.bfloat16)
        ks = jnp.asarray(rng.normal(size=(3, 3, C, E * CO)).astype(
            np.float32) * 0.05, jnp.bfloat16)
        bs = jnp.asarray(rng.normal(size=(E * CO,)), jnp.float32)
        attn = jax.nn.softmax(jnp.asarray(
            rng.normal(size=(B, E)), jnp.float32), axis=-1)
        mul = jnp.asarray(rng.uniform(0.5, 1.5, (CO,)), jnp.float32)
        bn_add = jnp.asarray(rng.normal(size=(CO,)), jnp.float32)

        @jax.jit
        def stacked(x, ks, bs, attn):
            y = conv(x, ks) + bs.astype(x.dtype)
            b, h, w, _ = y.shape
            y = y.reshape(b, h, w, E, CO)
            y = jnp.einsum("bhweo,be->bhwo", y, attn.astype(y.dtype))
            o = y.astype(jnp.float32) * mul + bn_add
            return (o * jax.nn.sigmoid(o)).astype(jnp.bfloat16)

        @jax.jit
        def kernelized(x, ks, bs, attn):
            km = mixed_kernel(ks.astype(jnp.float32), attn, CO) \
                .astype(jnp.bfloat16)
            add = bn_add + mixed_bias(bs, attn, CO) * mul
            return pallas_dyconv(x, km, mul, add, rs=args.rs)

        sync = lambda o: float(o[0, 0, 0, 0].astype(jnp.float32))
        ts = t(f"site{site} stacked (E={E}) XLA", lambda: stacked(
            x, ks, bs, attn), sync)
        if CO % 128:
            print(f"site{site}: CO={CO} not a lane multiple — kernel "
                  "skipped (needs an s2d-output variant)")
            continue
        tk = t(f"site{site} pallas mixed-kernel rs={args.rs}",
               lambda: kernelized(x, ks, bs, attn), sync)
        # numeric sanity at the real site
        a = np.asarray(stacked(x, ks, bs, attn), np.float32)
        b_ = np.asarray(kernelized(x, ks, bs, attn), np.float32)
        err = np.abs(a - b_).max()
        print(f"site{site}: speedup {ts / tk:.2f}x   max abs diff "
              f"{err:.4f} (bf16 reassociation)")


if __name__ == "__main__":
    main()
