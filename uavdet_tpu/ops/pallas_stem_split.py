"""Two-kernel Pallas stem: L1 pass (+ channel sums) then L2 pass.

Why two kernels (see PERF.md): DyConv L2's attention pools the L1
activation globally (GAP), so the mixed L2 kernel matrix cannot exist
before all of L1 is computed. Kernel A produces the L1 activation
(channel-major bf16 in HBM) plus per-strip channel sums; tiny XLA glue
computes attn₂ → the folded L2 matrix; kernel B consumes the activation.

Alignment choreography (Mosaic DMA needs 8-aligned sublane starts):
  * A: the frame arrives QUAD-PARITY-SPLIT into (row parity × column
    parity) planes (8 top pad rows + 1 left pad column each; one fused
    XLA relayout per plane, same total bytes as the old single NCHW
    transpose). Each strip DMAs a 72-row window from all four planes,
    stages every tap of every output quadrant as a CONTIGUOUS slice (the
    1-left-pad makes the three column taps plain offsets {0,1,2} — no
    rolls anywhere in A), runs four (32,28)@(28,64,WB) dots, and stores
    each output quadrant into its own bank ARRAY of the QUAD-FOLDED
    activation — four (B, 32, Hp/2, WB) arrays, bank q = 2·row_par +
    col_par, WB = ceil(w/2 / 128)·128. WB (not w/2) everywhere because
    Mosaic requires 128-multiples both of the dot's rhs lane count (its
    lowering reshapes the rank-3 rhs to (K, rows·lanes)) and of DMA
    slice extents (kernel B could not read a w/2-wide HBM array). Bank
    lanes [w/2, WB) are uninitialized garbage: every path that could
    read them ends in a value that is sliced off or where-masked before
    any store — never a mask MULTIPLY, since garbage may be NaN. A also
    emits per-strip channel sums (a (32, 128)-padded second output,
    real lanes only) so the L2 attention GAP never re-reads the
    activation from HBM.
  * B: strip s emits TR2 output rows, consuming folded rows
    [TR2·s − 1, TR2·s + TR2). Four DMAs (one per bank) bring the TR2
    fresh folded rows [TR2·s, TR2·(s+1)) straight into the window
    scratch (8-aligned, double-buffered across the GLOBAL strip sequence
    so the prefetch chain survives image boundaries); the 8-row top halo
    region is copied from the previous strip's slot (zeros for s=0 — the
    conv's top padding). Stride-2 output column c taps input columns
    {2c−1, 2c, 2c+1} = {odd bank rolled right by 1, even bank, odd
    bank}: ONE quarter-area roll replaces round 2's two full-width
    rolls (the roll's lane-0 wrap — the conv's left padding — is
    where-masked to zero), the 9 taps are full-width bank slices, the
    main dot runs at N = WB (vs round 2's w = 2·w/2), and the
    even-column selection matmul (measured 2.0 ms of the old 8.7 ms
    kernel, scripts/l2_ablate.py) is gone — the output IS the even
    columns. Every activation byte still crosses HBM exactly once, and
    rows past the image are zero in the activation itself (A masks
    them).

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


def make_l1_kernel(wq: int, h: int, n_a: int, dot_mode: int = 0):
    """``dot_mode`` (perf experiment, VERDICT r4 item 3b — all modes are
    BITWISE-equal, see pallas_l1):
      0  four (32,28)@(28,HALF,WB) rank-3 dots (the shipped form)
      1  four rank-2 dots: the staged patches are explicitly pre-flattened
         to (28, HALF·WB) so Mosaic lowers a plain 2-D matmul instead of
         its internal rank-3 rhs reshape
      2  ONE block-diagonal dot (128,112)@(112, HALF·WB): the four
         quadrants stack along M so the MXU's M=128 padding does real
         work (the r3 K-packed attempt, but with the rank-2 rhs its
         neutrality was blamed on). Requires no row-overhang
         (h % 128 == 0) — the caller gates this."""
    # The input DMA is double-buffered over the GLOBAL strip counter
    # (measured r3: the original start+wait-in-place serialization cost
    # ~1.4 ms of the kernel's 5.6 — the DMA latency was never hidden).
    #
    # QUAD-PARITY-SPLIT input (r3; see module docstring): the caller
    # hands the frame pre-split into four (row parity × column parity)
    # planes (one fused XLA relayout each, same total bytes as the old
    # single NCHW transpose). With 8 top pad rows and 1 left pad column
    # per plane, EVERY tap of every output quadrant is a contiguous
    # (row, col)-offset slice of one of the four windows — no rolls, no
    # in-kernel fold, and each quadrant is stored straight into its bank
    # of the quad-folded layout.
    #   Row taps (as before, per output-row parity ρ): out even row 2R
    #   taps real rows {2R−1 (odd, R−1), 2R (even, R), 2R+1 (odd, R)};
    #   out odd row 2R+1 taps {2R (even, R), 2R+1 (odd, R), 2R+2
    #   (even, R+1)}.
    #   Column taps (per output-col parity γ, plane lane l = col l−1):
    #   out even col 2C taps cols {2C−1, 2C, 2C+1} = odd[C−1], even[C],
    #   odd[C] → (plane, lane offset) {(odd,0), (even,1), (odd,1)};
    #   out odd col 2C+1 → {(even,1), (odd,1), (even,2)}.
    HALF = RA // 2
    WB = -(-wq // 128) * 128          # staged/dot lane width
    # (row_plane_is_odd, window row offset) per ki, indexed by row parity
    ROW_TAB = (((1, 7), (0, 0), (1, 8)), ((0, 0), (1, 8), (0, 1)))
    # (col_plane_is_odd, lane offset) per kj, indexed by col parity
    COL_TAB = (((1, 0), (0, 1), (1, 1)), ((0, 1), (1, 1), (0, 2)))

    def kern(xee_ref, xeo_ref, xoe_ref, xoo_ref, k1_ref,
             oee_ref, oeo_ref, ooe_ref, ooo_ref, sums_ref,
             p1a_ref, p1b_ref, p1c_ref, p1d_ref,
             wee_ref, weo_ref, woe_ref, woo_ref,
             sem_ee, sem_eo, sem_oe, sem_oo):
        bi = pl.program_id(0)
        ai = pl.program_id(1)
        n_b = pl.num_programs(0)
        wp = xee_ref.shape[-1]        # plane lane width (≥ wq + 2)

        # even-row windows: local l ↔ real even row 64a+l (DMA start
        #   64a+8 in the 8-top-padded plane, 72 rows)
        # odd-row windows:  local l ↔ real odd row 64a+l−8 (DMA start 64a)
        planes = ((xee_ref, wee_ref, sem_ee, 8),
                  (xeo_ref, weo_ref, sem_eo, 8),
                  (xoe_ref, woe_ref, sem_oe, 0),
                  (xoo_ref, woo_ref, sem_oo, 0))

        def copies(b_, a_, slot):
            out = []
            for src_ref, win_ref, sem, top in planes:
                p0 = pl.multiple_of(a_ * HALF + top, 8)
                out.append(pltpu.make_async_copy(
                    src_ref.at[b_, :, pl.ds(p0, HALF + 8), :],
                    win_ref.at[slot, :, :, pl.ds(0, wp)], sem.at[slot]))
            return out

        g = bi * n_a + ai
        slot = jax.lax.rem(g, 2)

        # NOTE the window tails [wp, wp+128) are never initialized: tap
        # lanes reading them only feed acc lanes ≥ wp−2 ≥ wq — stored as
        # the banks' garbage pad lanes, excluded from the channel sums,
        # and sliced/masked before any real store in kernel B. Lanes are
        # elementwise independent through the dot (contraction is over K
        # only), so garbage never leaks into a real lane.
        @pl.when(g == 0)
        def _():
            for c in copies(0, 0, 0):
                c.start()

        for c in copies(bi, ai, slot):
            c.wait()

        @pl.when(ai + 1 < n_a)
        def _():
            for c in copies(bi, ai + 1, 1 - slot):
                c.start()

        @pl.when((ai + 1 == n_a) & (bi + 1 < n_b))
        def _():
            for c in copies(bi + 1, 0, 1 - slot):
                c.start()

        wins = {(0, 0): wee_ref[slot], (0, 1): weo_ref[slot],
                (1, 0): woe_ref[slot], (1, 1): woo_ref[slot]}

        # taps, ki-major then kj (mix_and_fold order). uint8 planes are
        # cast to bf16 here, fused into the staging copy (0..255 is
        # exact in bf16; /255 is folded into k1 by the caller) — the
        # planes stay one byte per pixel in HBM and over the DMA.
        def stage(par, gam, p1_ref):
            t = 0
            for ki in range(3):
                rp, roff = ROW_TAB[par][ki]
                for kj in range(3):
                    cp, coff = COL_TAB[gam][kj]
                    src = wins[(rp, cp)]
                    tap = src[:, roff:roff + HALF, coff:coff + WB]
                    if tap.dtype == jnp.uint8:
                        # Mosaic has no direct u8→bf16; route through
                        # i32→f32 (exact for 0..255)
                        tap = tap.astype(jnp.int32).astype(jnp.float32)
                    p1_ref[3 * t:3 * (t + 1)] = tap.astype(jnp.bfloat16)
                    t += 1
            p1_ref[27:28] = jnp.ones((1, HALF, WB), jnp.bfloat16)

        # f32 accumulator + epilogue: Mosaic requires a 32-bit matmul acc,
        # and its bf16 `logistic` lowering is broken (vector.broadcast
        # element-type verification failure)
        def quad_out(par, gam, p1_ref):
            stage(par, gam, p1_ref)
            if dot_mode == 1:
                # rank-2 rhs: pre-flatten (28, HALF, WB) → (28, HALF·WB)
                # so the dot is a plain 2-D matmul; un-merge after
                acc1 = jax.lax.dot_general(
                    k1_ref[0], p1_ref[...].reshape(28, HALF * WB),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32
                ).reshape(32, HALF, WB)
            else:
                acc1 = jax.lax.dot_general(
                    k1_ref[0], p1_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (32, HALF, WB)
            xl1 = acc1 * jax.nn.sigmoid(acc1)
            if (h - par + 1) // 2 % HALF != 0:
                # zero rows beyond the image (planes are over-allocated).
                # The conv of the zero-padded rows yields silu(bias) ≠ 0,
                # so this mask is required — but only when strips overhang
                # the image. Parity row R is in-image iff 2R+par < h.
                # (where-select: pad lanes may hold NaN garbage.)
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (HALF, WB), 0) + ai * HALF
                xl1 = jnp.where((2 * row + par)[None] < h, xl1, 0.0)
            return xl1.astype(jnp.bfloat16)

        # per-strip channel sums of the STORED bf16 values (so the L2
        # attention GAP sees exactly what kernel B reads) — saves the
        # XLA GAP's full re-read of the activation from HBM. Lanes 1..127
        # of the (32, 128) output block are zero padding.
        srow = jnp.zeros((32, HALF), jnp.float32)
        scratches = (p1a_ref, p1b_ref, p1c_ref, p1d_ref)
        outs = (oee_ref, oeo_ref, ooe_ref, ooo_ref)
        if dot_mode == 2:
            # ONE block-diagonal dot: quadrants stacked along M (the lhs
            # is kron-placed k1, extra accumulation terms are EXACT
            # zeros → bitwise-equal to mode 0). Row overhang unsupported
            # (caller gates on h % 128 == 0, so the mask is compile-time
            # absent here anyway).
            for q, (par, gam) in enumerate(((0, 0), (0, 1), (1, 0),
                                            (1, 1))):
                stage(par, gam, scratches[q])
            # pad K 112→128 with EXPLICIT zero rows: Mosaic's implicit
            # tile padding of a K=112 contraction reads undefined VMEM
            # (measured: 178/52M one-ULP flips), defined zeros are exact
            rhs = jnp.concatenate(
                [r[...].reshape(28, HALF * WB) for r in scratches]
                + [jnp.zeros((16, HALF * WB), jnp.bfloat16)],
                axis=0)                                    # (128, HALF·WB)
            acc = jax.lax.dot_general(
                k1_ref[0], rhs,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (128, HALF·WB)
            xq = acc * jax.nn.sigmoid(acc)
            for q in range(4):
                v = xq[32 * q:32 * (q + 1)].reshape(
                    32, HALF, WB).astype(jnp.bfloat16)
                outs[q][0] = v
                srow = srow + jnp.sum(v[:, :, :wq].astype(jnp.float32),
                                      axis=2)
            stot = jnp.sum(srow, axis=1, keepdims=True)    # (32, 1)
            sums_ref[0, 0] = jnp.pad(stot, ((0, 0), (0, 127)))
            return
        for q, (par, gam) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            v = quad_out(par, gam, scratches[q])
            outs[q][0] = v
            # sums over REAL lanes only — [wq, WB) may hold garbage
            srow = srow + jnp.sum(v[:, :, :wq].astype(jnp.float32),
                                  axis=2)
        stot = jnp.sum(srow, axis=1, keepdims=True)            # (32, 1)
        sums_ref[0, 0] = jnp.pad(stot, ((0, 0), (0, 127)))
    return kern


def make_l2_kernel(wq: int, tr2: int, half_out: int = None):
    """``wq`` = W//2 = the output width. ``half_out``: output lane count
    ≥ wq — extra lanes come out zero, giving downstream strip kernels a
    128-aligned lane width."""
    half_out = half_out or wq
    WB = -(-wq // 128) * 128          # staged/dot lane width

    def kern(aee_ref, aeo_ref, aoe_ref, aoo_ref, k2_ref, out_ref,
             p2_ref, wf_ref, sem):
        bi = pl.program_id(0)
        si = pl.program_id(1)
        n_s = pl.num_programs(1)
        n_b = pl.num_programs(0)

        # Halo-reuse DMA over the QUAD-FOLDED activation (four
        # (B, 32, Hp/2, WB) bank arrays, bank q = 2·row_par + col_par;
        # lanes [wq, WB) carry uninitialized garbage — see pallas_l1).
        # Strip si emits L2 rows [tr2·si, tr2·(si+1)), consuming folded
        # rows [tr2·si − 1, tr2·si + tr2). Four DMAs land the tr2 fresh
        # rows straight in the window at sublane 8; the 8-row top halo
        # region holds the previous strip's tail (zeros for si == 0 —
        # the conv's top padding). Slot parity follows the GLOBAL strip
        # counter so the prefetch chain stays valid across image
        # boundaries.
        banks = (aee_ref, aeo_ref, aoe_ref, aoo_ref)

        def fresh_copies(b_, s, slot):
            start = pl.multiple_of(s * tr2, 8)
            return [pltpu.make_async_copy(
                bank.at[b_, :, pl.ds(start, tr2), :],
                wf_ref.at[slot, :, q, 8:8 + tr2, :],
                sem.at[slot, q]) for q, bank in enumerate(banks)]

        g = bi * n_s + si
        slot = jax.lax.rem(g, 2)

        # NOTE the window lane tails [wq, WB) hold the banks' garbage:
        # tap lanes reading them only feed acc lanes ≥ wq, which are
        # sliced off (NHWC) or masked (raw_cm) before the store; the
        # roll's lane-0 wrap (which reads tail lane WB−1) is masked
        # below.
        @pl.when(g == 0)
        def _():
            for c in fresh_copies(bi, 0, 0):
                c.start()

        for c in fresh_copies(bi, si, slot):
            c.wait()

        # halo rows [tr2·si − 8, tr2·si): copied out of the other slot
        # BEFORE that slot's next DMA is started below
        @pl.when(si == 0)
        def _():
            wf_ref[slot, :, :, 0:8] = jnp.zeros((32, 4, 8, WB),
                                                jnp.bfloat16)

        @pl.when(si > 0)
        def _():
            wf_ref[slot, :, :, 0:8] = wf_ref[1 - slot, :, :,
                                             tr2:tr2 + 8, :]

        @pl.when(si + 1 < n_s)
        def _():
            for c in fresh_copies(bi, si + 1, 1 - slot):
                c.start()

        @pl.when((si + 1 == n_s) & (bi + 1 < n_b))
        def _():
            for c in fresh_copies(bi + 1, 0, 1 - slot):
                c.start()

        # window row f ↔ folded row tr2·si − 8 + f. Output row ρ, tap ki
        # reads L1 row 2(tr2·si + ρ) + ki − 1:
        #   ki=0 → folded row tr2·si + ρ − 1, odd-row banks → window 7+ρ
        #   ki=1 → folded row tr2·si + ρ,     even-row banks → window 8+ρ
        #   ki=2 → folded row tr2·si + ρ,     odd-row banks → window 8+ρ
        # Output col c, tap kj reads L1 col 2c + kj − 1:
        #   kj=0 → odd-col bank, position c−1 → rolled right by 1 (the
        #          wrap lane 0 is masked to zero — the conv's left pad)
        #   kj=1 → even-col bank, position c
        #   kj=2 → odd-col bank, position c
        # No in-kernel image mask: rows past the image are zero in the
        # activation itself (kernel A masks them). ONE quarter-area roll
        # (vs round 2's two full-width rolls); the f32 round-trip around
        # the roll matches the measured-fastest pattern from r3. The
        # lane-0 mask zeroes the roll's wrap — the conv's left padding.
        win = wf_ref[slot][:, :, 7:8 + tr2, :]     # (32, 4, tr2+1, WB)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tr2 + 1, WB), 1)
        rolled = pltpu.roll(win.astype(jnp.float32), 1, 3) \
            .astype(jnp.bfloat16)
        # where-select, NOT a mask multiply: the wrap lane may hold
        # uninitialized-tail garbage (NaN·0 = NaN)
        rolled = jnp.where(lane[None, None] != 0, rolled,
                           jnp.bfloat16(0.0))

        t = 0
        for ki in range(3):
            r_p = 0 if ki == 1 else 1
            r0 = 0 if ki == 0 else 1
            for kj in range(3):
                c_p = 0 if kj == 1 else 1
                src = rolled if kj == 0 else win
                bank = 2 * r_p + c_p
                p2_ref[32 * t:32 * (t + 1)] = src[:, bank,
                                                  r0:r0 + tr2, :]
                t += 1
        if WB > wq:
            # bias only on real columns, so raw_cm pad lanes stay zero
            lane = jax.lax.broadcasted_iota(jnp.int32, (tr2, WB), 1)
            p2_ref[288:289] = jnp.where(lane < wq, 1.0, 0.0) \
                .astype(jnp.bfloat16)[None]
        else:
            p2_ref[288:289] = jnp.ones((1, tr2, WB), jnp.bfloat16)

        acc2 = jax.lax.dot_general(
            k2_ref[0], p2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (64, tr2, WB)
        if half_out < WB:
            acc2 = acc2[:, :, :half_out]
        out = (acc2 * jax.nn.sigmoid(acc2)).astype(jnp.bfloat16)
        if half_out > wq:
            # raw_cm contract: lanes past wq are ZERO (they carry
            # uninitialized-tail garbage — possibly NaN — otherwise, so
            # where-select rather than mask-multiply)
            olane = jax.lax.broadcasted_iota(
                jnp.int32, (tr2, half_out), 1)
            out = jnp.where(olane[None] < wq, out, jnp.bfloat16(0.0))
        out_ref[0] = out
    return kern


@partial(jax.jit, static_argnames=("interpret", "dot_mode"))
def pallas_l1(x, k1_aug, interpret: bool = False, dot_mode: int = None):
    """x (B,H,W,3) → (xl1: a 4-tuple of (B,32,Hp/2,W/2) bf16
    channel-major QUAD-FOLDED bank arrays, bank q = 2·row_par + col_par,
    and channel sums (B,32) f32). W must be even (the stem gate
    guarantees it).

    Hp = H rounded up to 64 plus 24 over-allocated rows for kernel B's
    aligned windows (content beyond H is zero).

    ``dot_mode`` (default env UAVDET_L1_DOT_MODE or 0): the kernel-A dot
    decomposition experiment — see make_l1_kernel. All modes bitwise-
    equal; mode 2 needs h % 128 == 0 (falls back to 0 otherwise)."""
    import os
    if dot_mode is None:
        dot_mode = int(os.environ.get("UAVDET_L1_DOT_MODE", "0"))
    b, h, w, _ = x.shape
    if dot_mode == 2 and h % 128:
        dot_mode = 0  # row-overhang mask unsupported in the fused dot
    # H must be even too: the beyond-image row-mask skip tests PER-PARITY
    # row-count divisibility ((h±1)//2 % 64), which for odd H can pass
    # while the strip grid still overhangs — silu(bias) garbage would
    # then land in the banks AND the channel sums (r3 review).
    if h % 2 or w % 2:
        raise ValueError(f"pallas_l1 needs even H and W, got {h}x{w}")
    wq = w // 2
    wq_pad = -(-(wq + 2) // 128) * 128
    n_a = -(-h // RA)
    hp = n_a * RA + 24
    half = RA // 2
    # Transpose BEFORE the dtype cast: for uint8 frames the NHWC→NCHW
    # relayout moves half the bytes (measured 0.5 ms vs 2.1 ms at
    # bs=16@640) — the /255 normalization is folded into k1_aug by the
    # caller, so uint8 values flow into the matmul directly.
    #
    # QUAD-PARITY planes (see make_l1_kernel): (row parity × col parity)
    # subsampled frames as four arrays, 8 top pad rows + 1 left pad col
    # each, bottoms sized for the last strip's 72-row aligned window
    # ([64a+8, 64a+80) even rows / [64a, 64a+72) odd). uint8 frames stay
    # uint8 (the XLA split writes 1 byte/px instead of 2, and kernel A's
    # input DMA halves); the in-kernel tap staging does the exact bf16
    # cast. Total plane bytes = the frame's (split in four, not copied).
    plane_dt = jnp.uint8 if x.dtype == jnp.uint8 else jnp.bfloat16
    # Column-parity via reshape+transpose, NOT a minor-dim strided
    # slice: xt[:, :, :, g::2] measured 8.2 ms at bs=16@640 (a lane
    # shuffle XLA does terribly), while moving the (2, 3) minor block
    # into leading dims is the same relayout class as the old NCHW
    # transpose (~0.5 ms). Row parity stays a (cheap) sublane stride.
    x5 = x.reshape(b, h, wq, 2, 3).transpose(0, 3, 4, 1, 2)
    x5 = x5.astype(plane_dt)                   # (B, 2, 3, H, Wq)
    rows_e, rows_o = (h + 1) // 2, h // 2
    pads = {0: (8, half * n_a + 8 - rows_e), 1: (8, half * n_a - rows_o)}

    def plane(par, gam):
        sub = x5[:, gam, :, par::2, :]
        return jnp.pad(sub, ((0, 0), (0, 0), pads[par],
                             (1, wq_pad - wq - 1)))

    planes = [plane(p_, g_) for p_ in (0, 1) for g_ in (0, 1)]
    # banks are WB = ceil(wq/128)·128 lanes wide: Mosaic DMA slice
    # extents must be 128-aligned, so kernel B could not read a wq-wide
    # HBM array. Lanes [wq, WB) are UNINITIALIZED garbage (never read
    # into any stored value — see the kernels' notes).
    wb = -(-wq // 128) * 128
    bank_shape = jax.ShapeDtypeStruct((b, 32, hp // 2, wb), jnp.bfloat16)
    bank_spec = pl.BlockSpec((1, 32, RA // 2, wb),
                             lambda bi, ai: (bi, 0, ai, 0),
                             memory_space=pltpu.VMEM)

    k1_in = k1_aug.astype(jnp.bfloat16)
    k1_block = (1, 32, 28)
    if dot_mode == 2:
        # kron-place k1 into the (128, 112) block-diagonal lhs: output
        # rows 32q..32q+32 contract only against K rows 28q..28q+28
        # (quadrant q's staged patches); the off-block zeros contribute
        # exact zeros to the f32 accumulation
        k1bd = jnp.zeros((k1_in.shape[0], 128, 128), jnp.bfloat16)
        for q in range(4):
            k1bd = k1bd.at[:, 32 * q:32 * (q + 1),
                           28 * q:28 * (q + 1)].set(k1_in)
        k1_in = k1bd
        k1_block = (1, 128, 128)

    *xl1, strip_sums = pl.pallas_call(
        make_l1_kernel(wq, h, n_a, dot_mode),
        grid=(b, n_a),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4 + [
            pl.BlockSpec(k1_block, lambda bi, ai: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[bank_spec] * 4 + [
            pl.BlockSpec((1, 1, 32, 128), lambda bi, ai: (bi, ai, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[bank_shape] * 4 + [
            jax.ShapeDtypeStruct((b, n_a, 32, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((28, half, wb), jnp.bfloat16),   # p1 ee
            pltpu.VMEM((28, half, wb), jnp.bfloat16),   # p1 eo
            pltpu.VMEM((28, half, wb), jnp.bfloat16),   # p1 oe
            pltpu.VMEM((28, half, wb), jnp.bfloat16),   # p1 oo
            # window lane tail [wq_pad, wq_pad+128) is NEVER initialized
            # (see the in-kernel NOTE): tap lanes reading it only feed
            # acc lanes ≥ wq, which every consumer slices or
            # where-SELECTS away (never mask-multiplies — garbage may
            # be NaN)
            pltpu.VMEM((2, 3, half + 8, wq_pad + 128), plane_dt),  # ee
            pltpu.VMEM((2, 3, half + 8, wq_pad + 128), plane_dt),  # eo
            pltpu.VMEM((2, 3, half + 8, wq_pad + 128), plane_dt),  # oe
            pltpu.VMEM((2, 3, half + 8, wq_pad + 128), plane_dt),  # oo
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(*planes, k1_in)
    # GAP = Σ strips of the in-kernel per-strip channel sums (a few KB)
    # instead of an XLA reduce that re-reads the whole activation
    sums = jnp.sum(strip_sums[:, :, :, 0], axis=1)
    return tuple(xl1), sums


@partial(jax.jit, static_argnames=("h", "wq", "over_rows", "raw_cm",
                                   "interpret"))
def pallas_l2(xl1, k2_aug, h: int, wq: int,
              over_rows: int = 0, raw_cm: bool = False,
              interpret: bool = False):
    """xl1: 4-tuple of (B,32,Hp/2,WB) quad-folded bank arrays from
    pallas_l1 → (B,H/2,W/2,64) NHWC.

    ``h`` is the TRUE image height and ``wq`` the TRUE output width W/2.
    Both are REQUIRED: pallas_l1 over-allocates Hp = ceil(H/64)·64 + 24
    and 128-pads the banks' lane count, so neither can be recovered from
    the array shapes (a silent wrong guess would treat uninitialized pad
    lanes/rows — possibly NaN — as image content). H must be divisible
    by 16; the strip height doubles to 16 when H is divisible by 32
    (fewer, bigger programs — the kernel is per-program-overhead-bound,
    not bandwidth-bound).

    ``over_rows``: extra unwritten rows past H/2 in the output allocation
    (a downstream strip kernel's aligned read window). ``raw_cm``: return
    the raw (B, 64, H/2 + over_rows, ceil(W/2 /128)·128) channel-major
    array — lanes past W/2 are zero — instead of the sliced NHWC
    transpose (kernel-only timing and strip-kernel consumers)."""
    b, _, hp2, wb = xl1[0].shape
    if h % 16 != 0:
        raise ValueError(f"pallas_l2 needs H divisible by 16, got {h}")
    tr2 = next(t for t in (32, 16, 8) if (h // 2) % t == 0)
    n_s = (h // 2) // tr2
    # NOT padded to 128 lanes in NHWC mode: padding the store was
    # measured r3 — the aligned store saves ~1.3 µs/program in-kernel but
    # inflates the store bytes and the downstream NHWC transpose read by
    # 20%, a net loss end-to-end
    half_out = wb if raw_cm else wq

    out = pl.pallas_call(
        make_l2_kernel(wq, tr2, half_out),
        grid=(b, n_s),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4 + [
            pl.BlockSpec((1, 64, 289), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 64, tr2, half_out),
                               lambda bi, si: (bi, 0, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 64, h // 2 + over_rows, half_out),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((289, tr2, wb), jnp.bfloat16),
            pltpu.VMEM((2, 32, 4, tr2 + 8, wb), jnp.bfloat16),  # windows
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        # tr2=32 needs ~16 MB scoped VMEM — within v5e's VMEM, above the
        # compiler's conservative 16 MB default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(*xl1, k2_aug.astype(jnp.bfloat16))
    if raw_cm:
        return out
    return out[:, :, :h // 2].transpose(0, 2, 3, 1)


def fused_stem_forward(x, dy0_params, dy0_stats, dy1_params, dy1_stats,
                       attn_temp: float, interpret: bool = False,
                       folded: bool = False):
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

    if folded:
        # parity-folded output for the folded early stage (ops/fold_early):
        # fold straight from the raw channel-major kernel output — ONE
        # transpose, replacing the NHWC transpose, so the fold relayout
        # is free relative to the unfolded path
        from .fold_early import fold_cm
        cm = pallas_l2(xl1, k2, h=h, wq=w // 2, raw_cm=True,
                       interpret=interpret)
        return fold_cm(cm, h // 2, w // 2)
    return pallas_l2(xl1, k2, h=h, wq=w // 2, interpret=interpret)


def detector_stem_fast_path(model, variables, layer_config, attn_temp,
                            interpret: bool = False,
                            input_size: int = None,
                            fold_early: bool = False):
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

    if fold_early:
        # consume the tail's [B,1] + [128,3,2] tokens into the
        # parity-folded early stage (ops/fold_early): the stem emits the
        # folded layout straight from the kernels' channel-major output
        # (one transpose either way) and the early convs run lane-dense
        from .fold_early import fold_early_fast_path
        got = fold_early_fast_path(tail_model, tail_variables)
        if got is not None:
            early_fn, tail_model, tail_variables = got

            def stem_fn(x):  # noqa: F811 — folded variant
                xf = fused_stem_forward(x, dy0p, dy0s, dy1p, dy1s,
                                        attn_temp, interpret=interpret,
                                        folded=True)
                return early_fn(xf)

    return stem_fn, tail_model, tail_variables
