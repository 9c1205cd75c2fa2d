"""Two-kernel Pallas stem: L1 pass (+ channel sums) then L2 pass.

Why two kernels (see PERF.md): DyConv L2's attention pools the L1
activation globally (GAP), so the mixed L2 kernel matrix cannot exist
before all of L1 is computed. Kernel A produces the L1 activation
(channel-major bf16 in HBM) plus per-strip channel sums; tiny XLA glue
computes attn₂ → the folded L2 matrix; kernel B consumes the activation.

Alignment choreography (Mosaic DMA needs 8-aligned sublane starts):
  * A: the frame arrives PARITY-SPLIT into even/odd row planes (8 top
    pad rows each; one fused XLA relayout per plane, same total bytes as
    the old single NCHW transpose). Each strip DMAs a 72-row window from
    both planes, stages taps as contiguous row slices, and stores each
    parity half straight into its lane bank of the ROW-PAIR-FOLDED
    activation — (32, RA/2, 2w), lane banks [0:w]=even row, [w:2w]=odd
    row, the exact layout kernel B's stride-2 taps want. (The fold as an
    in-kernel value-reshape measured ~12 µs/program — a sublane→lane
    relayout Mosaic does element-wise; splitting at the source makes it
    free.) A also emits per-strip channel sums (a (32, 128)-padded
    second output) so the L2 attention GAP never re-reads the activation
    from HBM.
  * B: strip s emits TR2 output rows, consuming folded rows
    [TR2·s − 1, TR2·s + TR2). One DMA brings the TR2 fresh folded rows
    [TR2·s, TR2·(s+1)) straight into the window scratch (8-aligned,
    double-buffered across the GLOBAL strip sequence so the prefetch
    chain survives image boundaries); the 8-row top halo region is
    copied from the previous strip's slot (zeros for s=0 — the conv's
    top padding). Every activation byte crosses HBM exactly once, there
    is no staging reshape in B at all (A pre-folded), and rows past the
    image are zero in the activation itself (A masks them).
  On TPU hardware the folded layout needs w % 128 == 0 (tap banks sit at
  lane offset w; Mosaic wants 128-aligned lane slices); interpret mode
  has no such constraint.

Kernel matrices come from ``pallas_stem.mix_and_fold`` (expert mixing +
BN + bias folded; bias as a ones-row contraction element).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RA = 128         # L1 rows per kernel-A strip (the kernels are
                 # per-program-overhead-bound — bigger strips win)


def make_l1_kernel(w: int, h: int, w_pad: int, n_a: int):
    # The input DMA is double-buffered over the GLOBAL strip counter
    # (measured r3: the original start+wait-in-place serialization cost
    # ~1.4 ms of the kernel's 5.6 — the DMA latency was never hidden).
    #
    # PARITY-SPLIT input (measured r3, ablation in scripts/block_ablate
    # + PERF.md): the row-pair fold as an in-kernel value-reshape costs
    # ~12 µs/program (a sublane→lane relayout Mosaic does element-wise).
    # Instead the caller hands the frame pre-split into even/odd row
    # planes (one fused XLA relayout each, same total bytes as the old
    # single NCHW transpose), the taps become contiguous row slices of
    # the two windows, and each parity half is STORED straight into its
    # lane bank of the folded layout — the fold never exists as an op.
    #   out even row 2R taps real rows {2R−1 (odd, R−1), 2R (even, R),
    #   2R+1 (odd, R)}; out odd row 2R+1 taps {2R (even, R), 2R+1
    #   (odd, R), 2R+2 (even, R+1)}.
    HALF = RA // 2

    def kern(xe_ref, xo_ref, k1_ref, xl1_ref, sums_ref, p1e_ref, p1o_ref,
             xse_ref, xso_ref, sem_e, sem_o):
        bi = pl.program_id(0)
        ai = pl.program_id(1)
        n_b = pl.num_programs(0)

        # even window: local l ↔ real even row 64a+l   (DMA start 64a+8
        #   in the 8-top-padded even plane, 72 rows)
        # odd window:  local l ↔ real odd row 64a+l−8  (DMA start 64a)
        def copy_e(b_, a_, slot):
            p0 = pl.multiple_of(a_ * HALF + 8, 8)
            return pltpu.make_async_copy(
                xe_ref.at[b_, :, pl.ds(p0, HALF + 8), :], xse_ref.at[slot],
                sem_e.at[slot])

        def copy_o(b_, a_, slot):
            p0 = pl.multiple_of(a_ * HALF, 8)
            return pltpu.make_async_copy(
                xo_ref.at[b_, :, pl.ds(p0, HALF + 8), :], xso_ref.at[slot],
                sem_o.at[slot])

        g = bi * n_a + ai
        slot = jax.lax.rem(g, 2)

        @pl.when(g == 0)
        def _():
            copy_e(0, 0, 0).start()
            copy_o(0, 0, 0).start()

        copy_e(bi, ai, slot).wait()
        copy_o(bi, ai, slot).wait()

        @pl.when(ai + 1 < n_a)
        def _():
            copy_e(bi, ai + 1, 1 - slot).start()
            copy_o(bi, ai + 1, 1 - slot).start()

        @pl.when((ai + 1 == n_a) & (bi + 1 < n_b))
        def _():
            copy_e(bi + 1, 0, 1 - slot).start()
            copy_o(bi + 1, 0, 1 - slot).start()

        xe = xse_ref[slot]                    # (3, HALF+8, w_pad)
        xo = xso_ref[slot]

        # taps, ki-major then kj (mix_and_fold order). Out-even row r:
        # ki=0 → odd local r+7, ki=1 → even local r, ki=2 → odd local r+8.
        # uint8 planes are cast to bf16 here, fused into the staging copy
        # (0..255 is exact in bf16; /255 is folded into k1 by the caller)
        # — the planes stay one byte per pixel in HBM and over the DMA.
        def stage(par, p1_ref):
            t = 0
            for ki in range(3):
                if par == 0:
                    src, off = ((xo, 7), (xe, 0), (xo, 8))[ki]
                else:
                    src, off = ((xe, 0), (xo, 8), (xe, 1))[ki]
                for kj in range(3):
                    tap = src[:, off:off + HALF, kj:kj + w]
                    if tap.dtype == jnp.uint8:
                        # Mosaic has no direct u8→bf16; route through
                        # i32→f32 (exact for 0..255)
                        tap = tap.astype(jnp.int32).astype(jnp.float32)
                    p1_ref[3 * t:3 * (t + 1)] = tap.astype(jnp.bfloat16)
                    t += 1
            p1_ref[27:28] = jnp.ones((1, HALF, w), jnp.bfloat16)

        # f32 accumulator + epilogue: Mosaic requires a 32-bit matmul acc,
        # and its bf16 `logistic` lowering is broken (vector.broadcast
        # element-type verification failure)
        def half_out(par, p1_ref):
            stage(par, p1_ref)
            acc1 = jax.lax.dot_general(
                k1_ref[0], p1_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (32, HALF, w)
            xl1 = acc1 * jax.nn.sigmoid(acc1)
            if (h - par + 1) // 2 % HALF != 0:
                # zero rows beyond the image (planes are over-allocated).
                # The conv of the zero-padded rows yields silu(bias) ≠ 0,
                # so this mask is required — but only when strips overhang
                # the image. Parity row R is in-image iff 2R+par < h.
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (HALF, w), 0) + ai * HALF
                mask = jnp.where(2 * row + par < h, 1.0, 0.0)
                xl1 = xl1 * mask[None]
            return xl1.astype(jnp.bfloat16)

        even = half_out(0, p1e_ref)
        xl1_ref[0, :, :, 0:w] = even
        odd = half_out(1, p1o_ref)
        xl1_ref[0, :, :, w:2 * w] = odd
        # per-strip channel sums of the STORED bf16 values (so the L2
        # attention GAP sees exactly what kernel B reads) — saves the
        # XLA GAP's full re-read of the activation from HBM. Lanes 1..127
        # of the (32, 128) output block are zero padding.
        srow = (jnp.sum(even.astype(jnp.float32), axis=2)
                + jnp.sum(odd.astype(jnp.float32), axis=2))    # (32, HALF)
        stot = jnp.sum(srow, axis=1, keepdims=True)            # (32, 1)
        sums_ref[0, 0] = jnp.pad(stot, ((0, 0), (0, 127)))
    return kern


def make_l2_kernel(w: int, tr2: int, half_out: int = None):
    """``half_out``: output lane count ≥ w//2 — extra lanes come out zero
    (the even-column selection matmul simply has no matching column),
    giving downstream strip kernels a 128-aligned lane width for free."""
    half = w // 2
    half_out = half_out or half

    def kern(a_ref, k2_ref, out_ref, p2_ref, wf_ref, sem):
        bi = pl.program_id(0)
        si = pl.program_id(1)
        n_s = pl.num_programs(1)
        n_b = pl.num_programs(0)

        # Halo-reuse DMA over the FOLDED activation (a_ref is
        # (B, 32, Hp/2, 2w): lane bank [0:w] = even L1 row, [w:2w] = odd).
        # Strip si emits L2 rows [tr2·si, tr2·(si+1)), consuming folded
        # rows [tr2·si − 1, tr2·si + tr2). One DMA lands the tr2 fresh
        # rows straight in the window at sublane 8; the 8-row halo region
        # holds the previous strip's tail (zeros for si == 0 — the conv's
        # top padding). Slot parity follows the GLOBAL strip counter so
        # the prefetch chain stays valid across image boundaries.
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

        # halo rows [tr2·si − 8, tr2·si): copied out of the other slot
        # BEFORE that slot's next DMA is started below
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

        # window row f ↔ folded row tr2·si − 8 + f. Output row ρ, tap ki
        # reads L1 row 2(tr2·si + ρ) + ki − 1:
        #   ki=0 → folded row tr2·si + ρ − 1, odd bank  → window 7+ρ
        #   ki=1 → folded row tr2·si + ρ,     even bank → window 8+ρ
        #   ki=2 → folded row tr2·si + ρ,     odd bank  → window 8+ρ
        # No in-kernel image mask: rows past the image are zero in the
        # activation itself (kernel A masks them).
        #
        # ONE roll per dx over the whole window (measured r3: the
        # per-tap f32 cast+roll chains were 3x the roll area; taps are
        # now plain bf16 slice copies). The roll wraps across the
        # even/odd lane banks, so the edge masks zero BOTH banks' wrap
        # lanes ({0, w} for the left tap, {w-1, 2w-1} for the right) —
        # identical staged values to the old per-bank not_first/not_last.
        folded = wf_ref[slot]                      # (32, tr2+8, 2w)
        win = folded[:, 7:8 + tr2, :]              # (32, tr2+1, 2w)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (tr2 + 1, 2 * w), 1)
        mL = jnp.where((lane2 != 0) & (lane2 != w),
                       1.0, 0.0).astype(jnp.bfloat16)
        mR = jnp.where((lane2 != w - 1) & (lane2 != 2 * w - 1),
                       1.0, 0.0).astype(jnp.bfloat16)
        win32 = win.astype(jnp.float32)
        winL = (pltpu.roll(win32, 1, 2).astype(jnp.bfloat16) * mL[None])
        winR = (pltpu.roll(win32, 2 * w - 1, 2).astype(jnp.bfloat16)
                * mR[None])

        t = 0
        for ki in range(3):
            r0 = 0 if ki == 0 else 1
            b0 = 0 if ki == 1 else w
            for src in (winL, win, winR):
                p2_ref[32 * t:32 * (t + 1)] = src[:, r0:r0 + tr2,
                                                  b0:b0 + w]
                t += 1
        p2_ref[288:289] = jnp.ones((1, tr2, w), jnp.bfloat16)

        acc2 = jax.lax.dot_general(
            k2_ref[0], p2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (64, tr2, w)
        col = jax.lax.broadcasted_iota(jnp.int32, (w, half_out), 0)
        tgt = jax.lax.broadcasted_iota(jnp.int32, (w, half_out), 1)
        # bf16 even-column selection (an exact copy of values that are
        # about to be bf16-rounded anyway; f32 select runs the MXU at
        # half rate)
        sel = jnp.where(col == 2 * tgt, 1.0, 0.0).astype(jnp.bfloat16)
        acc2 = jax.lax.dot_general(
            acc2.astype(jnp.bfloat16), sel,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0] = (acc2 * jax.nn.sigmoid(acc2)).astype(jnp.bfloat16)
    return kern


@partial(jax.jit, static_argnames=("interpret",))
def pallas_l1(x, k1_aug, interpret: bool = False):
    """x (B,H,W,3) → (xl1 (B,32,Hp/2,2W) bf16 channel-major ROW-PAIR
    FOLDED — lane banks [0:W]=even row, [W:2W]=odd row — and channel sums
    (B,32) f32).

    Hp = H rounded up to 64 plus 24 over-allocated rows for kernel B's
    aligned windows (content beyond H is zero)."""
    b, h, w, _ = x.shape
    w_pad = -(-(w + 2) // 128) * 128
    n_a = -(-h // RA)
    hp = n_a * RA + 24
    half = RA // 2
    # Transpose BEFORE the dtype cast: for uint8 frames the NHWC→NCHW
    # relayout moves half the bytes (measured 0.5 ms vs 2.1 ms at
    # bs=16@640) — the /255 normalization is folded into k1_aug by the
    # caller, so uint8 values flow into the matmul directly.
    #
    # PARITY-SPLIT planes (see make_l1_kernel): even/odd real rows as two
    # arrays, 8 top pad rows each, bottoms sized for the last strip's
    # 72-row aligned window ([64a+8, 64a+80) even / [64a, 64a+72) odd).
    # uint8 frames stay uint8 (the XLA split writes 1 byte/px instead of
    # 2, and kernel A's input DMA halves); the in-kernel tap staging does
    # the exact bf16 cast.
    plane_dt = jnp.uint8 if x.dtype == jnp.uint8 else jnp.bfloat16
    xt = x.transpose(0, 3, 1, 2)
    rows_e, rows_o = (h + 1) // 2, h // 2
    xe = jnp.pad(xt[:, :, 0::2, :].astype(plane_dt),
                 ((0, 0), (0, 0), (8, half * n_a + 8 - rows_e),
                  (1, w_pad - w - 1)))
    xo = jnp.pad(xt[:, :, 1::2, :].astype(plane_dt),
                 ((0, 0), (0, 0), (8, half * n_a - rows_o),
                  (1, w_pad - w - 1)))

    xl1, strip_sums = pl.pallas_call(
        make_l1_kernel(w, h, w_pad, n_a),
        grid=(b, n_a),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 32, 28), lambda bi, ai: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 32, RA // 2, 2 * w),
                         lambda bi, ai: (bi, 0, ai, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 32, 128), lambda bi, ai: (bi, ai, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 32, hp // 2, 2 * w), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, n_a, 32, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((28, half, w), jnp.bfloat16),   # p1 even
            pltpu.VMEM((28, half, w), jnp.bfloat16),   # p1 odd
            pltpu.VMEM((2, 3, half + 8, w_pad), plane_dt),  # dbl-buf e
            pltpu.VMEM((2, 3, half + 8, w_pad), plane_dt),  # dbl-buf o
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(xe, xo, k1_aug.astype(jnp.bfloat16))
    # GAP = Σ strips of the in-kernel per-strip channel sums (a few KB)
    # instead of an XLA reduce that re-reads the whole activation
    sums = jnp.sum(strip_sums[:, :, :, 0], axis=1)
    return xl1, sums


@partial(jax.jit, static_argnames=("h", "over_rows", "raw_cm", "interpret"))
def pallas_l2(xl1, k2_aug, h: int = None, over_rows: int = 0,
              raw_cm: bool = False, interpret: bool = False):
    """xl1 (B,32,Hp/2,2W) folded bf16 from pallas_l1 → (B,H/2,W/2,64) NHWC.

    ``h`` is the TRUE image height; pallas_l1 over-allocates
    Hp = ceil(H/64)·64 + 24, so it cannot be recovered from the array shape
    unless H is divisible by 64. H must be divisible by 16; the strip
    height doubles to 16 when H is divisible by 32 (fewer, bigger
    programs — the kernel is per-program-overhead-bound, not
    bandwidth-bound).

    ``over_rows``: extra unwritten rows past H/2 in the output allocation
    (a downstream strip kernel's aligned read window). ``raw_cm``: return
    the raw (B, 64, H/2 + over_rows, ceil(W/2 /128)·128) channel-major
    array — lanes past W/2 are zero — instead of the sliced NHWC
    transpose (kernel-only timing and strip-kernel consumers)."""
    b, _, hp2, w2 = xl1.shape
    w = w2 // 2
    if h is None:
        h = 2 * hp2 - 24  # exact only when H was divisible by 64
    if h % 16 != 0:
        raise ValueError(f"pallas_l2 needs H divisible by 16, got {h}")
    tr2 = next(t for t in (32, 16, 8) if (h // 2) % t == 0)
    n_s = (h // 2) // tr2
    # NOT padded to 128 lanes in NHWC mode: padding the store was
    # measured r3 — the aligned store saves ~1.3 µs/program in-kernel but
    # inflates the store bytes and the downstream NHWC transpose read by
    # 20%, a net loss end-to-end
    half_out = -(-(w // 2) // 128) * 128 if raw_cm else w // 2

    out = pl.pallas_call(
        make_l2_kernel(w, tr2, half_out),
        grid=(b, n_s),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 64, 289), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 64, tr2, half_out),
                               lambda bi, si: (bi, 0, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 64, h // 2 + over_rows, half_out),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((289, tr2, w), jnp.bfloat16),
            pltpu.VMEM((2, 32, tr2 + 8, 2 * w), jnp.bfloat16),  # windows
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # tr2=16 needs ~19.3 MB scoped VMEM, tr2=32 ~38 MB — above the
        # compiler's conservative 16 MB default but within v5e's VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(xl1, k2_aug.astype(jnp.bfloat16))
    if raw_cm:
        return out
    return out[:, :, :h // 2].transpose(0, 2, 3, 1)


def fused_stem_forward(x, dy0_params, dy0_stats, dy1_params, dy1_stats,
                       attn_temp: float, interpret: bool = False):
    """Full two-pass fused stem from DyYOLO parameter trees.

    x: (B, H, W, 3) — either preprocessed frames in [0, 1] (any float
    dtype) or RAW uint8 frames: for uint8 the /255 normalization is
    folded into the k1 kernel matrix and the GAP for the L1 attention is
    computed directly on the bytes, so no separate preprocessing pass
    ever touches HBM.
    dy{0,1}_params/stats: the DyConvModule_{0,1} param / batch_stats
    subtrees (attn_fc1, attn_fc2, experts + BatchNorm_0).
    → (B, H/2, W/2, 64) bf16 NHWC — numerically the output of
    preprocess + the first two DyConv+BN+SiLU layers in inference mode.
    """
    from .pallas_stem import mix_and_fold

    def attn_of(pooled, p):
        a = pooled @ p["attn_fc1"]["kernel"]
        a = jnp.maximum(a, 0.0)
        a = a @ p["attn_fc2"]["kernel"] + p["attn_fc2"]["bias"]
        return jax.nn.softmax(a.astype(jnp.float32) / attn_temp, axis=-1)

    b, h, w, _ = x.shape
    is_u8 = x.dtype == jnp.uint8

    # L1 attention pools the (normalized) input. For uint8, sum the bytes
    # with an MXU dot (f32 accumulation; 0..255 is exact in bf16) — a
    # plain mean would re-read the frame through the 3-lane NHWC layout.
    if is_u8:
        ones = jnp.ones((h * w,), jnp.bfloat16)
        channel_sums = jnp.einsum(
            "p,bpc->bc", ones, x.reshape(b, h * w, 3).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        pooled1 = channel_sums / float(h * w * 255.0)
    else:
        pooled1 = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    attn1 = attn_of(pooled1, dy0_params)
    bn0p, bn0s = dy0_params["BatchNorm_0"], dy0_stats["BatchNorm_0"]
    k1 = mix_and_fold(dy0_params["experts"], attn1, bn0p["scale"],
                      bn0p["bias"], bn0s["mean"], bn0s["var"],
                      out_channels=32)
    if is_u8:
        # conv(x/255, K) == conv(x, K/255); bias column stays
        k1 = jnp.concatenate([k1[..., :-1] / 255.0, k1[..., -1:]], axis=-1)

    xl1, sums = pallas_l1(x, k1, interpret=interpret)

    # L2 attention pools the L1 activation (GAP = sums / (H·W))
    attn2 = attn_of(sums / float(h * w), dy1_params)
    bn1p, bn1s = dy1_params["BatchNorm_0"], dy1_stats["BatchNorm_0"]
    k2 = mix_and_fold(dy1_params["experts"], attn2, bn1p["scale"],
                      bn1p["bias"], bn1s["mean"], bn1s["var"],
                      out_channels=64)

    return pallas_l2(xl1, k2, h=h, interpret=interpret)


def detector_stem_fast_path(model, variables, layer_config, attn_temp,
                            interpret: bool = False,
                            input_size: int = None):
    """Build the Pallas-stem fast path for a DyYOLO-style detector.

    Returns (stem_fn, tail_model, tail_variables) where
    ``stem_fn(x_preprocessed)`` runs the fused front of the network and
    ``tail_model.apply(tail_variables, stem_out)`` runs the rest — or None
    if the config doesn't start with the DyConv(32,3,1), DyConv(64,3,2)
    stem this kernel implements.

    The tail model is the same interpreter over the remaining tokens; its
    auto-assigned module names shift by exactly the consumed module
    counts per flax type, so the variables tree is re-keyed accordingly.

    (Two further fast paths that also consumed the post-stem ResidualBlock
    + 3x3-s2 downsample — a fused strip kernel and an image-folded XLA
    variant — were built, tested bit-exact, measured SLOWER, and removed
    in round 3; the slope study in scripts/chain_slope.py showed the
    layer-level "waste" they chased was mostly measurement boundary
    artifact. Full post-mortem in PERF.md.)
    """
    cfg = [list(t) for t in layer_config]
    if len(cfg) < 2 or cfg[0] != ["DyConv", 32, 3, 1] \
            or cfg[1] != ["DyConv", 64, 3, 2]:
        return None

    from ..models.dy_yolo import DyYOLO

    p = variables["params"]["net"]
    s = variables["batch_stats"]["net"]

    def rekey(tree):
        out = {}
        for k, v in tree.items():
            if k.startswith("DyConvModule_"):
                i = int(k.split("_")[-1])
                if i >= 2:
                    out[f"DyConvModule_{i - 2}"] = v
            else:
                out[k] = v
        return out

    tail_variables = {
        "params": {"net": rekey(p)},
        "batch_stats": {"net": rekey(s)},
    }
    tail_model = DyYOLO(layer_config=tuple(tuple(t) for t in cfg[2:]),
                        attn_temperature=attn_temp,
                        n_anchors=model.n_anchors, dtype=model.dtype)

    dy0p, dy0s = p["DyConvModule_0"], s["DyConvModule_0"]
    dy1p, dy1s = p["DyConvModule_1"], s["DyConvModule_1"]

    def stem_fn(x):
        return fused_stem_forward(x, dy0p, dy0s, dy1p, dy1s, attn_temp,
                                  interpret=interpret)

    return stem_fn, tail_model, tail_variables
