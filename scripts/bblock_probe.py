#!/usr/bin/env python
"""Decompose the two worst XLA tail layers (PERF.md round-3).

`B x1 @320 c64` (7.35 ms vs 1.81 roofline) and `CNN 64→128 s2 @320`
(3.17 vs 0.91) at bs=16 are small-channel convs at large spatial size.
This probe times their pieces and two exact reformulations:

  * conv1 (1x1 64→32), conv2 (3x3 32→64), conv3 (3x3 s2 64→128) alone —
    locates the milliseconds (is the 32-ch intermediate's lane padding
    the cost, or the convs themselves?)
  * conv3 via space_to_depth: s2d(y) (160,160,256) → 2x2 s1 conv
    256→128 with the 3x3 taps scattered into the (2,2,4-phase) slots
    (1.78x the real FLOPs but MXU-aligned channels; exact numerics
    modulo f32 accumulation order)
  * conv2+conv3 fused-in-s2d variant is NOT probed: its dense-phase
    FLOP multiplier is 7.1x (see analysis in PERF.md).

Usage: python scripts/bblock_probe.py [--batch 16]
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
    k1 = jnp.asarray(rng.normal(size=(1, 1, 64, 32)) * 0.1, jnp.bfloat16)
    k2 = jnp.asarray(rng.normal(size=(3, 3, 32, 64)) * 0.1, jnp.bfloat16)
    k3 = jnp.asarray(rng.normal(size=(3, 3, 64, 128)) * 0.1, jnp.bfloat16)

    dn = ("NHWC", "HWIO", "NHWC")

    def t(name, fn, *a):
        f = jax.jit(fn)
        dt = _timer(lambda: f(*a),
                    lambda o: float(o.astype(jnp.float32)[(0,) * o.ndim]),
                    iters=args.iters)
        print(f"{name:<44s} {dt * 1e3:8.3f} ms", flush=True)
        return f

    # --- pieces -------------------------------------------------------------
    f1 = t("conv1 1x1 64->32", lambda a: jax.lax.conv_general_dilated(
        a, k1, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn), x)
    h = jax.block_until_ready(jax.jit(
        lambda a: jax.lax.conv_general_dilated(
            a, k1, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn))(x))
    t("conv2 3x3 32->64", lambda a: jax.lax.conv_general_dilated(
        a, k2, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn), h)
    t("conv3 3x3 s2 64->128", lambda a: jax.lax.conv_general_dilated(
        a, k3, (2, 2), [(1, 1), (1, 1)], dimension_numbers=dn), x)
    t("conv1+conv2 (one jit)", lambda a: jax.lax.conv_general_dilated(
        jax.lax.conv_general_dilated(a, k1, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=dn),
        k2, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn), x)

    # conv2 as a matmul over a 9-slice stack (materialized im2col)
    def conv2_im2col(a):
        p = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [p[:, i:i + S, j:j + S, :] for i in range(3)
                for j in range(3)]
        stack = jnp.concatenate(taps, axis=-1)          # (B,S,S,288)
        return jax.lax.dot_general(
            stack, k2.reshape(288, 64),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    t("conv2 as im2col matmul", conv2_im2col, h)

    # --- conv3 via space_to_depth -------------------------------------------
    def s2d(a):
        b, hh, ww, c = a.shape
        return a.reshape(b, hh // 2, 2, ww // 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, hh // 2, ww // 2, 4 * c)

    # scatter the 3x3 taps into a 2x2 conv over the s2d grid.
    # out[r,c] = sum_{ki,kj} k3[ki,kj] * y[2r+ki-1, 2c+kj-1]
    # y[2r+di, 2c+dj] = s2d(y_pad)[r + (di<0 ? -1? ...)] — use a padded y
    # shifted so indices stay in range: pad 2 rows/cols on top/left so
    # 2r+ki-1 = 2(r'+...)… simpler: pad y by 1 on top/left and 1 on
    # bottom/right, then out[r,c] = sum taps yp[2r+ki, 2c+kj] with
    # yp = pad(y, 1). yp[2a+p, 2b+q] = s2d(yp)[a, b, phase(p,q)] needs
    # even dims: pad to (S+2) even → S+2 is even for S=320. ✓
    def conv3_s2d(a):
        yp = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))   # (B,S+2,S+2,64)
        z = s2d(yp)                                         # (B,(S+2)/2,(S+2)/2,256)
        # tap (ki,kj): yp[2r+ki, 2c+kj] = z[r + (ki>=2), c + (kj>=2),
        #                                   phase(ki%2, kj%2)]
        # so a 2x2 conv over z: kernel kz[(a,b), 4*?]:
        kz = jnp.zeros((2, 2, 256, 128), jnp.bfloat16)
        for ki in range(3):
            for kj in range(3):
                a_, p = divmod(ki, 2)
                b_, q = divmod(kj, 2)
                ch0 = (p * 2 + q) * 64
                kz = kz.at[a_, b_, ch0:ch0 + 64, :].set(k3[ki, kj])
        return jax.lax.conv_general_dilated(
            z, kz, (1, 1), "VALID", dimension_numbers=dn)
    f3a = jax.jit(lambda a: jax.lax.conv_general_dilated(
        a, k3, (2, 2), [(1, 1), (1, 1)], dimension_numbers=dn))
    f3b = t("conv3 via s2d + 2x2 conv", conv3_s2d, x)
    ref = np.asarray(f3a(x).astype(jnp.float32))
    got = np.asarray(f3b(x).astype(jnp.float32))
    err = np.max(np.abs(ref - got)) / max(np.max(np.abs(ref)), 1e-6)
    print(f"  conv3 s2d relative max err: {err:.2e}  shapes {ref.shape} "
          f"{got.shape}", flush=True)

    # --- whole chains ---------------------------------------------------------
    def chain_plain(a):
        z = jax.lax.conv_general_dilated(a, k1, (1, 1), [(0, 0), (0, 0)],
                                         dimension_numbers=dn)
        z = jnp.maximum(z, 0.1 * z)
        f = jax.lax.conv_general_dilated(z, k2, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
        y = jnp.maximum(f, 0.1 * f) + a
        o = jax.lax.conv_general_dilated(y, k3, (2, 2), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
        return jnp.maximum(o, 0.1 * o)
    t("chain plain (rb + down, one jit)", chain_plain, x)

    # hidden channels zero-padded 32→64 (exact: extra channels have zero
    # conv1 kernels, zero conv2 taps — tests whether the 32-ch hidden
    # layout is what XLA chokes on, at 2x conv1/conv2 FLOPs)
    k1p = jnp.concatenate([k1, jnp.zeros((1, 1, 64, 32), jnp.bfloat16)],
                          axis=-1)
    k2p = jnp.concatenate([k2, jnp.zeros((3, 3, 32, 64), jnp.bfloat16)],
                          axis=2)

    def chain_hidden64(a):
        z = jax.lax.conv_general_dilated(a, k1p, (1, 1), [(0, 0), (0, 0)],
                                         dimension_numbers=dn)
        z = jnp.maximum(z, 0.1 * z)
        f = jax.lax.conv_general_dilated(z, k2p, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
        y = jnp.maximum(f, 0.1 * f) + a
        o = jax.lax.conv_general_dilated(y, k3, (2, 2), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
        return jnp.maximum(o, 0.1 * o)
    t("chain hidden64 (zero-padded, exact)", chain_hidden64, x)

    def chain_s2d_down(a):
        z = jax.lax.conv_general_dilated(a, k1, (1, 1), [(0, 0), (0, 0)],
                                         dimension_numbers=dn)
        z = jnp.maximum(z, 0.1 * z)
        f = jax.lax.conv_general_dilated(z, k2, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=dn)
        y = jnp.maximum(f, 0.1 * f) + a
        o = conv3_s2d(y)
        return jnp.maximum(o, 0.1 * o)
    t("chain with s2d downsample", chain_s2d_down, x)
    return 0


if __name__ == "__main__":
    sys.exit(main())
