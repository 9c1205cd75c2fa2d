"""Fused post-stem block kernel: ResidualBlock(64) @ H/2 + 3x3-s2 → 128.

DyYOLO's two layers after the DyConv stem — ``["B", 1]`` then
``[128, 3, 2]`` (reference conf/model/dy-yolo.yaml layer_config rows 3-4;
block semantics model/BaselineModel.py:10-45) — are the worst-measured
layers of the whole XLA tail (7.35 + 3.17 ms standalone at bs=16 @640 vs
a 2.7 ms combined roofline: small-channel convs at large spatial sizes
sit far below XLA's conv efficiency floor, see PERF.md). This kernel
computes the whole chain per VMEM strip with every intermediate kept
on-chip:

    x (64ch @ H/2, channel-major from the stem kernel B)
      → z = leaky₀.₁(BN(conv1x1 64→32))        [MXU dot, BN+bias folded]
      → f = leaky₀.₁(BN(conv3x3 32→64))        [9-tap patch stack dot]
      → y = x + f                              [residual]
      → leaky₀.₁(BN(conv3x3 s2 64→128))        [row-pair fold + 9-tap dot
                                                 + even-column selection]
      → out (128ch @ H/4, channel-major)

HBM traffic: read x once (with a 1.5× row-window overlap), write the
@H/4 output once — everything else never leaves VMEM.

Choreography (Mosaic DMA: 8-aligned sublane starts):
  * strip s emits ``tro`` output rows @H/4 (default 8; env
    UAVDET_PALLAS_BLOCK_TRO), consuming x rows [2T·s−3, 2T·s+2T+1]. One
    DMA brings F = ceil((2T+2)/8)·8 fresh rows into the window at
    sublane 8 (double-buffered on the GLOBAL strip counter); the 8-row
    halo region [2T·s−8, 2T·s) is copied from the previous strip's
    slot (zeros for s=0). The input must therefore be
    over-allocated by 8 rows past H/2 (``pallas_l2(..., over_rows=8)``);
    out-of-image rows are re-zeroed in-kernel (they realize the convs'
    zero padding).
  * fold banks are padded to 128-aligned lane offsets (Mosaic lane-slice
    rule), so any w works; rows must satisfy (H/2) % 16 == 0.

Weight matrices come from ``fold_cnnblock`` (BN + bias folded; bias as a
ones-row contraction element, tap order p = (ki·K + kj)·I + i exactly as
``pallas_stem.mix_and_fold``).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def fold_cnnblock(params, stats, eps: float = 1e-5):
    """CNNBlock (Conv_0 + BatchNorm_0, models/layers.py:111) → augmented
    matrix (O, kh·kw·I + 1) f32 with BN scale/shift folded in; the last
    column is the bias (contracted against a ones row)."""
    k = params["Conv_0"]["kernel"].astype(jnp.float32)   # (kh, kw, I, O)
    bn, st = params["BatchNorm_0"], stats["BatchNorm_0"]
    inv = (bn["scale"] / jnp.sqrt(st["var"] + eps)).astype(jnp.float32)
    kh, kw, ci, co = k.shape
    kf = (k.reshape(kh * kw * ci, co) * inv[None, :]).T   # (O, kh·kw·I)
    bf = (bn["bias"] - st["mean"] * inv).astype(jnp.float32)
    return jnp.concatenate([kf, bf[:, None]], axis=-1)


def _leaky(x):
    return jnp.maximum(x, 0.1 * x)


def make_block_kernel(w: int, h2: int, wp: int, tro: int):
    """``w``: true image width; ``wp``: the input's (128-aligned) lane
    count — all internal arithmetic runs at wp lanes, with lanes ≥ w
    masked to zero (they realize the convs' right-edge zero padding).
    ``tro``: output rows (@ H/4) per strip; strip geometry derives from
    it (fresh DMA rows F = ceil((2·tro+2)/8)·8, window W = F+8,
    intermediate rows ny = 2·tro+2)."""
    half = w // 2
    F = -(-(2 * tro + 2) // 8) * 8
    W = F + 8
    ny = 2 * tro + 2

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

        # halo rows [2T·s−8, 2T·s) = previous strip's fresh rows
        # [2T−8, 2T) (window sublanes 2T:2T+8); copied BEFORE that
        # slot's next DMA
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

        # window local row l ↔ x row 2T·si − 8 + l, l ∈ [0, W)
        row = jax.lax.broadcasted_iota(jnp.int32, (W, wp), 0) + (
            si * 2 * tro - 8)
        laneW = jax.lax.broadcasted_iota(jnp.int32, (W, wp), 1)
        okb = (row >= 0) & (row < h2) & (laneW < w)
        ok = jnp.where(okb, 1.0, 0.0)
        # select (not multiply): rows past the image are UNWRITTEN in the
        # over-allocated input — arbitrary bits, possibly Inf/NaN. Staged
        # through a scratch ref so the MXU dot below reads a VMEM operand
        # (value operands force a vreg relayout).
        xw_ref[...] = jnp.where(okb[None], wf_ref[slot],
                                jnp.bfloat16(0))             # (64, W, wp)
        xw = xw_ref[...]

        # ---- 1x1 64→32 + BN + leaky --------------------------------------
        z = jax.lax.dot_general(
            w1_ref[:, 0:64], xw_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (32, W, wp)
        z = _leaky(z + w1_ref[:, 64:65].astype(jnp.float32)[:, :, None])
        # conv zero-padding: out-of-image rows/lanes of z must be zero
        z = (z * ok[None]).astype(jnp.bfloat16)

        lane = jax.lax.broadcasted_iota(jnp.int32, (ny, wp), 1)
        nfy = jnp.where(lane >= 1, 1.0, 0.0).astype(jnp.bfloat16)
        nly = jnp.where(lane < w - 1, 1.0, 0.0).astype(jnp.bfloat16)

        # ---- 3x3 32→64 + BN + leaky, rows m ∈ [0,ny) ↔ x 2T·s−1+m --------
        # taps: z local (7 + m − 1 + ki) = 6 + m + ki
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
        pf_ref[288:289] = jnp.ones((1, ny, wp), jnp.bfloat16)

        f = jax.lax.dot_general(
            k2_ref[...], pf_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (64, ny, wp)
        y = _leaky(f) + xw[:, 7:7 + ny, :].astype(jnp.float32)  # residual
        yrow = jax.lax.broadcasted_iota(jnp.int32, (ny, wp), 0) + (
            si * 2 * tro - 1)
        ylane = jax.lax.broadcasted_iota(jnp.int32, (ny, wp), 1)
        yok = jnp.where((yrow >= 0) & (yrow < h2) & (ylane < w), 1.0, 0.0)
        y = (y * yok[None]).astype(jnp.bfloat16)

        # ---- 3x3 s2 64→128: row-pair fold + 9-tap dot + even-col select --
        yf_ref[...] = y.reshape(64, ny // 2, 2 * wp)
        yf = yf_ref[...]
        # out row ρ taps y rows m = 2ρ+ki: ki=0 → fold row ρ bank0,
        # ki=1 → ρ bank1, ki=2 → ρ+1 bank0
        laneT = jax.lax.broadcasted_iota(jnp.int32, (tro, wp), 1)
        nfT = jnp.where(laneT >= 1, 1.0, 0.0).astype(jnp.bfloat16)
        nlT = jnp.where(laneT < w - 1, 1.0, 0.0).astype(jnp.bfloat16)
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
        p3_ref[576:577] = jnp.ones((1, tro, wp), jnp.bfloat16)

        acc = jax.lax.dot_general(
            k3_ref[...], p3_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (128,tro,wp)
        col = jax.lax.broadcasted_iota(jnp.int32, (wp, half), 0)
        tgt = jax.lax.broadcasted_iota(jnp.int32, (wp, half), 1)
        sel = jnp.where(col == 2 * tgt, 1.0, 0.0).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            acc.astype(jnp.bfloat16), sel,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (128,tro,half)
        out_ref[0] = _leaky(acc).astype(jnp.bfloat16)
    return kern


@partial(jax.jit, static_argnames=("h2", "w", "tro", "interpret"))
def pallas_block_down(x_cm, w1_aug, k2_aug, k3_aug, h2: int, w: int = None,
                      tro: int = None, interpret: bool = False):
    """x_cm (B, 64, H2+8, Wp) channel-major bf16 (8 over-allocated rows
    and a 128-aligned lane count with ZERO content past the true width —
    ``pallas_l2(..., over_rows=8, raw_cm=True)`` output) →
    (B, 128, H2/2, W/2) channel-major bf16.

    ``h2``: true row count, divisible by 2·tro. ``w``: true width
    (defaults to the lane count; on hardware the lane count must be a
    multiple of 128 for the in-kernel reshapes). ``tro``: output rows
    per strip (default: env UAVDET_PALLAS_BLOCK_TRO or 8)."""
    import os

    b, c, hp, wp = x_cm.shape
    w = w or wp
    if tro is None:
        tro = int(os.environ.get("UAVDET_PALLAS_BLOCK_TRO", "8"))
    if c != 64 or hp < h2 + 8 or wp < w:
        raise ValueError(f"expected (B,64,>= h2+8,>= w), got {x_cm.shape}")
    if h2 % (2 * tro) != 0:
        raise ValueError(f"h2 must be divisible by {2 * tro}, got {h2}")
    n_s = h2 // (2 * tro)
    F = -(-(2 * tro + 2) // 8) * 8
    ny = 2 * tro + 2

    out = pl.pallas_call(
        make_block_kernel(w, h2, wp, tro),
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
        out_specs=pl.BlockSpec((1, 128, tro, w // 2),
                               lambda bi, si: (bi, 0, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 128, h2 // 2, w // 2),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((289, ny, wp), jnp.bfloat16),      # f patches
            pltpu.VMEM((64, ny // 2, 2 * wp), jnp.bfloat16),  # y fold
            pltpu.VMEM((577, tro, wp), jnp.bfloat16),     # s2 patches
            pltpu.VMEM((2, 64, F + 8, wp), jnp.bfloat16),  # DMA windows
            pltpu.VMEM((64, F + 8, wp), jnp.bfloat16),    # masked window
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_cm, w1_aug.astype(jnp.bfloat16), k2_aug.astype(jnp.bfloat16),
      k3_aug.astype(jnp.bfloat16))
    return out
