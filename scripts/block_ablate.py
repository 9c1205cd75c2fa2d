#!/usr/bin/env python
"""Per-stage ablation of the fused post-stem block kernel (kernel C).

Kernel C (ops/pallas_block.py) measures 12.5 ms vs XLA's 9.2 at bs=16
@640 — ~39 µs/program where the dots alone account for ~12 µs. This
script isolates where the rest goes, the same methodology that cracked
kernel A in round 2 (PERF.md): cumulative stage variants, each its own
compiled program, timed on the real chip with a value-fetch sync.

Stages (cumulative):
  dma     DMA window in + halo copy + derived store (the floor)
  mask    + the masked-window copy (xw staging)
  dot1    + the 1x1 64→32 dot + leaky + mask
  stage2  + the 3x3 tap staging (6 rolls + 9 copies into pf)
  dot2    + the 3x3 32→64 dot + residual + mask
  fold    + the row-pair fold of y
  stage3  + the s2 tap staging (6 rolls + 9 copies into p3)
  full    + the s2 dot + even-col select + real store  (= kernel C)

Candidate fixes (variants of full):
  noxw    skip xw staging: dot1 reads the DMA window ref directly
  roll1   ONE roll per dx on z (2 rolls total), taps become plain copies
  roll3   same for the s2 stage: pre-roll y, fold 3 banks, taps = slices
  nofold  kill the row-pair fold: conv3 at FULL rows (contiguous tap
          slices), even-row extraction on the final (smallest) tensor
  pad256  128-aligned output lanes (store alignment diagnostic)
  nosel   skip the even-col selection dot (diagnostic)

Usage: python scripts/block_ablate.py [--batch 16] [--tro 8] [--iters 20]
       [--only full,noxw,...]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_kernel(w, h2, wp, tro, stage, noxw=False, roll1=False,
                 roll3=False, nofold=False, pad256=False, nosel=False,
                 extract="stride"):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental import pallas as pl

    half = w // 2
    wout = 256 if pad256 else half
    F = -(-(2 * tro + 2) // 8) * 8
    W = F + 8
    ny = 2 * tro + 2
    nf = ny - 2

    def _leaky(x):
        return jnp.maximum(x, 0.1 * x)

    ORDER = ["dma", "mask", "dot1", "stage2", "dot2", "fold", "stage3",
             "full"]
    lvl = ORDER.index(stage)

    def kern(x_ref, w1_ref, k2_ref, k3_ref, out_ref, pf_ref, yf_ref,
             p3_ref, wf_ref, xw_ref, sem):
        bi = pl.program_id(0)
        si = pl.program_id(1)
        n_s = pl.num_programs(1)
        n_b = pl.num_programs(0)

        def fresh_copy(b_, s, slot):
            start = pl.multiple_of(s * 2 * tro, 8)
            return pltpu.make_async_copy(
                x_ref.at[b_, :, pl.ds(start, F), :],
                wf_ref.at[slot, :, 8:8 + F, :], sem.at[slot])

        g = bi * n_s + si
        slot = jax.lax.rem(g, 2)

        @pl.when(g == 0)
        def _():
            fresh_copy(bi, 0, 0).start()

        fresh_copy(bi, si, slot).wait()

        @pl.when(si == 0)
        def _():
            wf_ref[slot, :, 0:8] = jnp.zeros((64, 8, wp), jnp.bfloat16)

        @pl.when(si > 0)
        def _():
            wf_ref[slot, :, 0:8] = wf_ref[1 - slot, :,
                                          2 * tro:2 * tro + 8, :]

        @pl.when(si + 1 < n_s)
        def _():
            fresh_copy(bi, si + 1, 1 - slot).start()

        @pl.when((si + 1 == n_s) & (bi + 1 < n_b))
        def _():
            fresh_copy(bi + 1, 0, 1 - slot).start()

        if lvl == 0:  # dma
            v = wf_ref[slot][:, 0:tro, 0:half]
            out_ref[0] = jnp.concatenate([v, v], axis=0)
            return

        row = jax.lax.broadcasted_iota(jnp.int32, (W, wp), 0) + (
            si * 2 * tro - 8)
        laneW = jax.lax.broadcasted_iota(jnp.int32, (W, wp), 1)
        okb = (row >= 0) & (row < h2) & (laneW < w)
        ok = jnp.where(okb, 1.0, 0.0)

        if not noxw:
            xw_ref[...] = jnp.where(okb[None], wf_ref[slot],
                                    jnp.bfloat16(0))
            xw = xw_ref[...]
            x_op = xw_ref[...]
        else:
            xw = wf_ref[slot]
            x_op = wf_ref[slot]

        if lvl == 1:  # mask
            v = xw[:, 0:tro, 0:half]
            out_ref[0] = jnp.concatenate([v, v], axis=0)
            return

        # ---- 1x1 64→32 + BN + leaky ----
        z = jax.lax.dot_general(
            w1_ref[:, 0:64], x_op,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        z = _leaky(z + w1_ref[:, 64:65].astype(jnp.float32)[:, :, None])
        z = (z * ok[None]).astype(jnp.bfloat16)

        if lvl == 2:  # dot1
            v = z[:, 0:tro, 0:half]
            out_ref[0] = jnp.concatenate([v, v, v, v], axis=0)
            return

        lane = jax.lax.broadcasted_iota(jnp.int32, (ny, wp), 1)
        nfy = jnp.where(lane >= 1, 1.0, 0.0).astype(jnp.bfloat16)
        nly = jnp.where(lane < w - 1, 1.0, 0.0).astype(jnp.bfloat16)

        if not roll1:
            t = 0
            for ki in range(3):
                rows = z[:, 6 + ki:6 + ki + ny, :]
                rows32 = rows.astype(jnp.float32)
                left = (pltpu.roll(rows32, 1, 2).astype(jnp.bfloat16)
                        * nfy[None])
                right = (pltpu.roll(rows32, wp - 1, 2).astype(jnp.bfloat16)
                         * nly[None])
                for tap in (left, rows, right):
                    pf_ref[32 * t:32 * (t + 1)] = tap
                    t += 1
        else:
            # one roll per dx over the z rows all taps need (6..6+ny+2)
            nz = ny + 2
            laneZ = jax.lax.broadcasted_iota(jnp.int32, (nz, wp), 1)
            nfZ = jnp.where(laneZ >= 1, 1.0, 0.0).astype(jnp.bfloat16)
            nlZ = jnp.where(laneZ < w - 1, 1.0, 0.0).astype(jnp.bfloat16)
            zwin = z[:, 6:6 + nz, :]
            z32 = zwin.astype(jnp.float32)
            zL = (pltpu.roll(z32, 1, 2).astype(jnp.bfloat16) * nfZ[None])
            zR = (pltpu.roll(z32, wp - 1, 2).astype(jnp.bfloat16)
                  * nlZ[None])
            t = 0
            for ki in range(3):
                for tap in (zL[:, ki:ki + ny, :], zwin[:, ki:ki + ny, :],
                            zR[:, ki:ki + ny, :]):
                    pf_ref[32 * t:32 * (t + 1)] = tap
                    t += 1
        pf_ref[288:289] = jnp.ones((1, ny, wp), jnp.bfloat16)

        if lvl == 3:  # stage2
            v = pf_ref[0:128, 0:tro, 0:half]
            out_ref[0] = v
            return

        f = jax.lax.dot_general(
            k2_ref[...], pf_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = _leaky(f) + xw[:, 7:7 + ny, :].astype(jnp.float32)
        yrow = jax.lax.broadcasted_iota(jnp.int32, (ny, wp), 0) + (
            si * 2 * tro - 1)
        ylane = jax.lax.broadcasted_iota(jnp.int32, (ny, wp), 1)
        yok = jnp.where((yrow >= 0) & (yrow < h2) & (ylane < w), 1.0, 0.0)
        y = (y * yok[None]).astype(jnp.bfloat16)

        if lvl == 4:  # dot2
            v = y[:, 0:tro, 0:half]
            out_ref[0] = jnp.concatenate([v, v], axis=0)
            return

        if nofold:
            # conv3 at FULL rows: out_full[r] taps y rows r+ki (contiguous
            # slices of the pre-rolled banks); even rows extracted at the
            # very end on the smallest tensor in the chain.
            laneY = jax.lax.broadcasted_iota(jnp.int32, (ny, wp), 1)
            nfY = jnp.where(laneY >= 1, 1.0, 0.0).astype(jnp.bfloat16)
            nlY = jnp.where(laneY < w - 1, 1.0, 0.0).astype(jnp.bfloat16)
            y32 = y.astype(jnp.float32)
            yL = (pltpu.roll(y32, 1, 2).astype(jnp.bfloat16) * nfY[None])
            yR = (pltpu.roll(y32, wp - 1, 2).astype(jnp.bfloat16)
                  * nlY[None])
            if lvl == 5:  # fold (n/a) — store y-derived
                v = y[:, 0:tro, 0:wout]
                out_ref[0] = jnp.concatenate([v, v], axis=0)
                return
            t = 0
            for ki in range(3):
                for bank in (yL, y, yR):
                    p3_ref[64 * t:64 * (t + 1), 0:nf] = bank[:, ki:ki + nf]
                    t += 1
            p3_ref[576:577, 0:nf] = jnp.ones((1, nf, wp), jnp.bfloat16)
            if lvl == 6:  # stage3
                v = p3_ref[0:128, 0:tro, 0:wout]
                out_ref[0] = v
                return
            acc = jax.lax.dot_general(
                k3_ref[...], p3_ref[:, 0:nf],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (128, nf, wp)
            if nosel:
                accs = acc[:, :, 0:wout]
            else:
                col = jax.lax.broadcasted_iota(jnp.int32, (wp, wout), 0)
                tgt = jax.lax.broadcasted_iota(jnp.int32, (wp, wout), 1)
                sel = jnp.where((col == 2 * tgt) & (tgt < half),
                                1.0, 0.0).astype(jnp.bfloat16)
                accs = jax.lax.dot_general(
                    acc.astype(jnp.bfloat16), sel,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (128, nf, wout)
            if extract == "stride":
                ev = accs[:, 0::2, :]
            else:
                ev = accs.reshape(128, tro, 2, wout)[:, :, 0, :]
            out_ref[0] = _leaky(ev).astype(jnp.bfloat16)
            return

        laneT = jax.lax.broadcasted_iota(jnp.int32, (tro, wp), 1)
        nfT = jnp.where(laneT >= 1, 1.0, 0.0).astype(jnp.bfloat16)
        nlT = jnp.where(laneT < w - 1, 1.0, 0.0).astype(jnp.bfloat16)

        if not roll3:
            yf_ref[0] = y.reshape(64, ny // 2, 2 * wp)
            yf = yf_ref[0]
            if lvl == 5:  # fold
                v = yf[:, 0:tro, 0:half]
                out_ref[0] = jnp.concatenate([v, v], axis=0)
                return
            t = 0
            for ki in range(3):
                if ki == 0:
                    rows = yf[:, 0:tro, 0:wp]
                elif ki == 1:
                    rows = yf[:, 0:tro, wp:2 * wp]
                else:
                    rows = yf[:, 1:1 + tro, 0:wp]
                rows32 = rows.astype(jnp.float32)
                left = (pltpu.roll(rows32, 1, 2).astype(jnp.bfloat16)
                        * nfT[None])
                right = (pltpu.roll(rows32, wp - 1, 2).astype(jnp.bfloat16)
                         * nlT[None])
                for tap in (left, rows, right):
                    p3_ref[64 * t:64 * (t + 1)] = tap
                    t += 1
        else:
            # pre-roll y once per dx, fold all three banks
            laneY = jax.lax.broadcasted_iota(jnp.int32, (ny, wp), 1)
            nfY = jnp.where(laneY >= 1, 1.0, 0.0).astype(jnp.bfloat16)
            nlY = jnp.where(laneY < w - 1, 1.0, 0.0).astype(jnp.bfloat16)
            y32 = y.astype(jnp.float32)
            yL = (pltpu.roll(y32, 1, 2).astype(jnp.bfloat16) * nfY[None])
            yR = (pltpu.roll(y32, wp - 1, 2).astype(jnp.bfloat16)
                  * nlY[None])
            yf_ref[0] = y.reshape(64, ny // 2, 2 * wp)
            yf_ref[1] = yL.reshape(64, ny // 2, 2 * wp)
            yf_ref[2] = yR.reshape(64, ny // 2, 2 * wp)
            yfC, yfL, yfR = yf_ref[0], yf_ref[1], yf_ref[2]
            if lvl == 5:  # fold
                v = yfC[:, 0:tro, 0:half]
                out_ref[0] = jnp.concatenate([v, v], axis=0)
                return
            t = 0
            for ki in range(3):
                for bank in (yfL, yfC, yfR):
                    if ki == 0:
                        rows = bank[:, 0:tro, 0:wp]
                    elif ki == 1:
                        rows = bank[:, 0:tro, wp:2 * wp]
                    else:
                        rows = bank[:, 1:1 + tro, 0:wp]
                    # tap order must stay (ki-major, dx-minor): L, C, R
                    p3_ref[64 * t:64 * (t + 1)] = rows
                    t += 1
        p3_ref[576:577] = jnp.ones((1, tro, wp), jnp.bfloat16)

        if lvl == 6:  # stage3
            v = p3_ref[0:128, :, 0:half]
            out_ref[0] = v
            return

        acc = jax.lax.dot_general(
            k3_ref[...], p3_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if nosel:
            acc = acc[:, :, 0:wout]
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, (wp, wout), 0)
            tgt = jax.lax.broadcasted_iota(jnp.int32, (wp, wout), 1)
            sel = jnp.where((col == 2 * tgt) & (tgt < half),
                            1.0, 0.0).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                acc.astype(jnp.bfloat16), sel,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0] = _leaky(acc).astype(jnp.bfloat16)

    return kern


def run_variant(x_cm, w1, k2, k3, h2, w, tro, stage, noxw, roll1, roll3,
                iters, nofold=False, pad256=False, nosel=False,
                extract="stride"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, c, hp, wp = x_cm.shape
    n_s = h2 // (2 * tro)
    F = -(-(2 * tro + 2) // 8) * 8
    ny = 2 * tro + 2
    n_yf = 3 if roll3 else 1
    wout = 256 if pad256 else w // 2
    p3_rows = (ny - 2) if nofold else tro

    @jax.jit
    def go(x):
        return pl.pallas_call(
            build_kernel(w, h2, wp, tro, stage, noxw, roll1, roll3,
                         nofold, pad256, nosel, extract),
            grid=(b, n_s),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((32, 65), lambda bi, si: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, 289), lambda bi, si: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 577), lambda bi, si: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 128, tro, wout),
                                   lambda bi, si: (bi, 0, si, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 128, h2 // 2, wout),
                                           jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((289, ny, wp), jnp.bfloat16),
                pltpu.VMEM((n_yf, 64, ny // 2, 2 * wp), jnp.bfloat16),
                pltpu.VMEM((577, p3_rows, wp), jnp.bfloat16),
                pltpu.VMEM((2, 64, F + 8, wp), jnp.bfloat16),
                pltpu.VMEM((64, F + 8, wp), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x, w1, k2, k3)

    def sync(o):
        return float(o[0, 0, 0, 0].astype(jnp.float32))

    sync(go(x_cm))
    for _ in range(3):
        sync(go(x_cm))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = go(x_cm)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--input", type=int, default=640)
    ap.add_argument("--tro", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    b, s = args.batch, args.input
    h2 = w = s // 2
    wp = -(-w // 128) * 128
    hp = h2 + 8
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, 64, hp, wp)).astype(np.float32)
    x[:, :, h2:, :] = 0.0
    x[:, :, :, w:] = 0.0
    x_cm = jnp.asarray(x, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(32, 65)) * 0.1, jnp.bfloat16)
    k2 = jnp.asarray(rng.normal(size=(64, 289)) * 0.1, jnp.bfloat16)
    k3 = jnp.asarray(rng.normal(size=(128, 577)) * 0.1, jnp.bfloat16)

    n_prog = b * (h2 // (2 * args.tro))

    variants = [
        ("dma", {}), ("mask", {}), ("dot1", {}), ("stage2", {}),
        ("dot2", {}), ("fold", {}), ("stage3", {}), ("full", {}),
        ("full", {"noxw": True}),
        ("full", {"roll1": True}),
        ("full", {"roll1": True, "roll3": True}),
        ("full", {"noxw": True, "roll1": True, "roll3": True}),
        ("full", {"nofold": True}),
        ("full", {"nofold": True, "noxw": True, "roll1": True}),
        ("full", {"nofold": True, "noxw": True, "roll1": True,
                  "pad256": True}),
        ("full", {"nofold": True, "noxw": True, "roll1": True,
                  "extract": "reshape"}),
        ("full", {"noxw": True, "roll1": True}),
        ("full", {"nosel": True}),
        ("full", {"pad256": True}),
    ]
    def name_of(st, kw):
        return "+".join(
            [st] + sorted(k if v is True else f"{k}={v}"
                          for k, v in kw.items() if v and v != "stride"))

    if args.only:
        keep = set(args.only.split(","))
        variants = [(st, kw) for st, kw in variants
                    if name_of(st, kw) in keep]

    for stage, kw in variants:
        name = name_of(stage, kw)
        try:
            dt = run_variant(x_cm, w1, k2, k3, h2, w, args.tro, stage,
                             kw.get("noxw", False), kw.get("roll1", False),
                             kw.get("roll3", False), args.iters,
                             nofold=kw.get("nofold", False),
                             pad256=kw.get("pad256", False),
                             nosel=kw.get("nosel", False),
                             extract=kw.get("extract", "stride"))
            print(f"{name:<28s} {dt * 1e3:8.3f} ms   "
                  f"{dt / n_prog * 1e6:7.2f} us/program", flush=True)
        except Exception as e:
            print(f"{name:<28s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
