#!/usr/bin/env python
"""Kernel-B (pallas_l2) stage-by-stage ablation on real TPU.

Mirrors the kernel-A cumulative ablation (PERF.md r3): variants of the L2
kernel cut off after successive stages, each still writing the output
block (a cheap function of the stage's product, so Mosaic cannot elide
the work). Also measures a MOCK of the proposed quad-parity redesign:
stage only w/2 output columns (9 half-width tap copies), run the main dot
at N=w/2, skip the even-column selection matmul entirely — the cost shape
of a (row x col)-parity folded activation layout.

Usage: python scripts/l2_ablate.py [--batch 16] [--input 640]
"""

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from uavdet_tpu.utils.timing import time_per_iter as _timer


def make_kernel(w, tr2, half_out, stage):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(a_ref, k2_ref, out_ref, p2_ref, wf_ref, sem):
        bi = pl.program_id(0)
        si = pl.program_id(1)
        n_s = pl.num_programs(1)
        n_b = pl.num_programs(0)

        if stage == 0:  # store floor
            out_ref[0] = jnp.zeros((64, tr2, half_out), jnp.bfloat16)
            return

        def fresh_copy(b_, s, slot):
            start = pl.multiple_of(s * tr2, 8)
            return pltpu.make_async_copy(
                a_ref.at[b_, :, pl.ds(start, tr2), :],
                wf_ref.at[slot, :, 8:8 + tr2, :], sem.at[slot])

        g = bi * n_s + si
        slot = jax.lax.rem(g, 2)

        @pl.when(g == 0)
        def _():
            fresh_copy(bi, 0, 0).start()

        fresh_copy(bi, si, slot).wait()

        @pl.when(si == 0)
        def _():
            wf_ref[slot, :, 0:8] = jnp.zeros((32, 8, 2 * w), jnp.bfloat16)

        @pl.when(si > 0)
        def _():
            wf_ref[slot, :, 0:8] = wf_ref[1 - slot, :, tr2:tr2 + 8, :]

        @pl.when(si + 1 < n_s)
        def _():
            fresh_copy(bi, si + 1, 1 - slot).start()

        @pl.when((si + 1 == n_s) & (bi + 1 < n_b))
        def _():
            fresh_copy(bi + 1, 0, 1 - slot).start()

        folded = wf_ref[slot]                      # (32, tr2+8, 2w)
        win = folded[:, 7:8 + tr2, :]              # (32, tr2+1, 2w)

        if stage == 1:  # +DMA
            out_ref[0, :32] = win[:, :tr2, :half_out]
            out_ref[0, 32:] = jnp.zeros((32, tr2, half_out), jnp.bfloat16)
            return

        lane2 = jax.lax.broadcasted_iota(jnp.int32, (tr2 + 1, 2 * w), 1)
        mL = jnp.where((lane2 != 0) & (lane2 != w),
                       1.0, 0.0).astype(jnp.bfloat16)
        mR = jnp.where((lane2 != w - 1) & (lane2 != 2 * w - 1),
                       1.0, 0.0).astype(jnp.bfloat16)
        win32 = win.astype(jnp.float32)
        winL = (pltpu.roll(win32, 1, 2).astype(jnp.bfloat16) * mL[None])
        winR = (pltpu.roll(win32, 2 * w - 1, 2).astype(jnp.bfloat16)
                * mR[None])

        if stage == 2:  # +rolls
            out_ref[0, :32] = winL[:, :tr2, :half_out]
            out_ref[0, 32:] = winR[:, :tr2, :half_out]
            return

        if stage == "half":
            # quad-parity MOCK: stage only w/2 columns per tap (the cost
            # shape of parity-split staging; values are placeholders),
            # main dot at N=w/2, NO selection matmul. Keeps both rolls
            # (the real redesign needs one, on half the lanes —
            # conservative).
            # Lane-pad the staged width to a 128 multiple (matches the
            # real design's 384-padded banks); dot runs at N=hwp.
            hw = w // 2
            hwp = -(-hw // 128) * 128          # 384 for w=640
            t = 0
            for ki in range(3):
                r0 = 0 if ki == 0 else 1
                b0 = 0 if ki == 1 else w
                for src in (winL, win, winR):
                    p2_ref[32 * t:32 * (t + 1), :, :hwp] = \
                        src[:, r0:r0 + tr2, b0:b0 + hwp]
                    t += 1
            p2_ref[288:289, :, :hwp] = jnp.ones((1, tr2, hwp),
                                                jnp.bfloat16)
            acc2 = jax.lax.dot_general(
                k2_ref[0], p2_ref[:, :, :hwp],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (64, tr2, hwp)
            acc2 = acc2[:, :, :half_out]
            out_ref[0] = (acc2 * jax.nn.sigmoid(acc2)).astype(jnp.bfloat16)
            return

        t = 0
        for ki in range(3):
            r0 = 0 if ki == 0 else 1
            b0 = 0 if ki == 1 else w
            for src in (winL, win, winR):
                p2_ref[32 * t:32 * (t + 1)] = src[:, r0:r0 + tr2,
                                                  b0:b0 + w]
                t += 1
        p2_ref[288:289] = jnp.ones((1, tr2, w), jnp.bfloat16)

        if stage == 3:  # +staging
            out_ref[0, :32] = p2_ref[:32, :, :half_out]
            out_ref[0, 32:] = p2_ref[32:64, :, :half_out]
            return

        acc2 = jax.lax.dot_general(
            k2_ref[0], p2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (64, tr2, w)

        if stage == 4:  # +main dot
            out_ref[0] = acc2[:, :, :half_out].astype(jnp.bfloat16)
            return

        col = jax.lax.broadcasted_iota(jnp.int32, (w, half_out), 0)
        tgt = jax.lax.broadcasted_iota(jnp.int32, (w, half_out), 1)
        sel = jnp.where(col == 2 * tgt, 1.0, 0.0).astype(jnp.bfloat16)
        acc2 = jax.lax.dot_general(
            acc2.astype(jnp.bfloat16), sel,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        if stage == 5:  # +selection dot
            out_ref[0] = acc2.astype(jnp.bfloat16)
            return

        out_ref[0] = (acc2 * jax.nn.sigmoid(acc2)).astype(jnp.bfloat16)

    return kern


def run_variant(xl1, k2, h, stage):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, _, hp2, w2 = xl1.shape
    w = w2 // 2
    tr2 = next(t for t in (32, 16, 8) if (h // 2) % t == 0)
    n_s = (h // 2) // tr2
    half_out = w // 2

    fn = pl.pallas_call(
        make_kernel(w, tr2, half_out, stage),
        grid=(b, n_s),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 64, 289), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 64, tr2, half_out),
                               lambda bi, si: (bi, 0, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 64, h // 2, half_out),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((289, tr2, w), jnp.bfloat16),
            pltpu.VMEM((2, 32, tr2 + 8, 2 * w), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )
    return jax.jit(lambda x_, k_: fn(x_, k_))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--input", type=int, default=640)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--stages", type=str, default="",
                    help="comma list, e.g. '4,5,half' (default: all)")
    args = ap.parse_args()

    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    B, S = args.batch, args.input
    hp2 = (-(-S // 64) * 64 + 24) // 2
    rng = np.random.default_rng(0)
    xl1 = jnp.asarray(rng.normal(size=(B, 32, hp2, 2 * S)) * 0.1,
                      jnp.bfloat16)
    k2 = jnp.asarray(rng.normal(size=(B, 64, 289)) * 0.05, jnp.bfloat16)
    n_prog = B * ((S // 2) // 32)

    sync = lambda r: float(jnp.sum(r[:1, :1, :1, :8].astype(jnp.float32)))
    names = {0: "store floor", 1: "+input DMA (halo reuse)",
             2: "+rolls (winL/winR)", 3: "+9x patch staging",
             4: "+main dot (N=w)", 5: "+selection matmul",
             6: "FULL (SiLU epilogue)",
             "half": "QUAD-PARITY MOCK (half staging, N=w/2, no sel)"}
    stages = [0, 1, 2, 3, 4, 5, 6, "half"]
    if args.stages:
        picked = [s.strip() for s in args.stages.split(",")]
        stages = [s for s in stages if str(s) in picked]
    for stage in stages:
        fn = run_variant(xl1, k2, S, stage if stage != 6 else 7)
        dt = _timer(lambda: fn(xl1, k2), sync, iters=args.iters)
        print(f"stage {stage!s:>4} {names[stage]:<46s} "
              f"{dt * 1e3:8.3f} ms  ({dt / n_prog * 1e6:6.1f} us/prog)",
              flush=True)


if __name__ == "__main__":
    main()
