"""Per-sample dynamic-kernel 3x3 conv — the TPU answer to the
reference's ``groups=batch`` cuDNN trick.

The reference applies per-sample dynamic convolutions by folding the
batch into cuDNN groups (reference model/RTMUAVDet.py:84-98; the DySOEM
expert attention at model/DySOEM_SimFPN.py:77-91 is the same math:
conv is LINEAR in the kernel, so attention-over-E-experts == one conv
with the per-sample attention-mixed kernel). XLA has no good lowering
for any per-sample-kernel form on TPU — ``batch_group_count`` convs,
vmap-of-conv, and feature-grouped convs all measured 2-4x slower than
running E stacked convs at E× the FLOPs (PERF.md r1/r3 rejections).
This kernel IS that missing lowering:

  out[b] = silu((conv2d(x[b], k[b], SAME, stride 1)) * mul + add[b])

with per-sample kernels k (B, 9, C, Co) (tap-major, attention-mixed in
XLA — E·9·C·Co FLOPs per sample, negligible) and a fused affine
epilogue: ``mul`` (Co,) carries the BN scale·rsqrt(var+eps), ``add``
(B, Co) carries bn_bias − mean·mul + mixed_conv_bias[b]·mul.

Design (v5e, Mosaic):
* layout (B, H, W, C): W on sublanes, C on lanes — C is a 128-multiple
  at every SOEM site, so the activations are lane-EXACT;
* grid (B, H/RS): each program DMAs its (RS+2)-row window (1-row halo
  each side) from HBM into a double-buffered VMEM scratch — the next
  window prefetches while this one computes. Boundary strips issue a
  1-row dummy DMA so EVERY variant lands exactly (RS+2)·W·C bytes on
  the slot semaphore (the wait descriptor is uniform); the dummy/pad
  rows are zeroed post-wait (the conv's SAME padding);
* column taps via one f32 roll each way (the kernel-B pattern: bf16
  roll is unsupported, the f32 round-trip measured fastest on this
  chip), the wrapped edge column where-selected to zero;
* the 9 taps accumulate as 9 MXU dots (RS·W, C) @ (C, Co) with an f32
  accumulator — M = RS·W is thousands, K/N are 128-multiples: full MXU
  tiles, no padding waste anywhere.

FLOP count is C·Co·9 per pixel — E× fewer than the stacked-experts
form — and the E·Co-wide expert map (5.0 GB at cfg3's soem_0) never
exists. Numerics: reassociation-level vs the stacked+contract form
(linearity; f64-verified for the XLA mixed-kernel formulation in
tests/test_pallas_dyconv.py; the kernel itself is parity-tested
against that formulation on real inputs and bitwise vs interpret
mode, the repo's standard two-step chain for bf16 kernels).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(H, W, C, CO, RS, emit_gap=False):
    n_s = H // RS

    def kern(x_hbm, k_ref, mul_ref, add_ref, out_ref, *rest):
        if emit_gap:
            gap_ref, win_ref, sem = rest
        else:
            win_ref, sem = rest
        bi = pl.program_id(0)
        si = pl.program_id(1)
        n_b = pl.num_programs(0)
        g = bi * n_s + si
        slot = jax.lax.rem(g, 2)

        def start(b_, s, dst):
            """Start the window DMAs for strip ``s`` of sample ``b_``.
            Every variant transfers exactly RS+2 rows to sem[dst]."""
            if n_s == 1:
                pltpu.make_async_copy(
                    x_hbm.at[b_, pl.ds(0, RS)],
                    win_ref.at[dst, pl.ds(1, RS)], sem.at[dst]).start()
                pltpu.make_async_copy(
                    x_hbm.at[b_, pl.ds(0, 1)],
                    win_ref.at[dst, pl.ds(0, 1)], sem.at[dst]).start()
                pltpu.make_async_copy(
                    x_hbm.at[b_, pl.ds(0, 1)],
                    win_ref.at[dst, pl.ds(RS + 1, 1)],
                    sem.at[dst]).start()
                return

            @pl.when(s == 0)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[b_, pl.ds(0, RS + 1)],
                    win_ref.at[dst, pl.ds(1, RS + 1)],
                    sem.at[dst]).start()
                pltpu.make_async_copy(          # dummy: uniform bytes
                    x_hbm.at[b_, pl.ds(0, 1)],
                    win_ref.at[dst, pl.ds(0, 1)], sem.at[dst]).start()

            @pl.when(s == n_s - 1)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[b_, pl.ds(H - RS - 1, RS + 1)],
                    win_ref.at[dst, pl.ds(0, RS + 1)],
                    sem.at[dst]).start()
                pltpu.make_async_copy(          # dummy: uniform bytes
                    x_hbm.at[b_, pl.ds(H - 1, 1)],
                    win_ref.at[dst, pl.ds(RS + 1, 1)],
                    sem.at[dst]).start()

            @pl.when((s > 0) & (s < n_s - 1))
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[b_, pl.ds(s * RS - 1, RS + 2)],
                    win_ref.at[dst], sem.at[dst]).start()

        def wait(dst):
            # uniform-byte wait: every variant above lands exactly
            # (RS+2)·W·C elements on sem[dst]
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, RS + 2)],
                win_ref.at[dst], sem.at[dst]).wait()

        @pl.when(g == 0)
        def _():
            start(bi, 0, 0)

        wait(slot)

        # prefetch the next strip (possibly of the next sample)
        @pl.when(si + 1 < n_s)
        def _():
            start(bi, si + 1, 1 - slot)

        @pl.when((si + 1 == n_s) & (bi + 1 < n_b))
        def _():
            start(bi + 1, 0, 1 - slot)

        # zero the pad rows (SAME padding; dummy-DMA rows overwritten)
        zrow = jnp.zeros((1, W, C), jnp.bfloat16)

        @pl.when(si == 0)
        def _():
            win_ref[slot, 0:1] = zrow

        @pl.when(si == n_s - 1)
        def _():
            win_ref[slot, RS + 1:RS + 2] = zrow

        win = win_ref[slot]                      # (RS+2, W, C) bf16
        # column taps: one f32 roll each way along the sublane (W)
        # axis; the wrapped edge column is where-selected to zero (the
        # conv's SAME padding) — select, not multiply (garbage-safe)
        col = jax.lax.broadcasted_iota(jnp.int32, (RS + 2, W, C), 1)
        wf = win.astype(jnp.float32)
        left = jnp.where(col != 0, pltpu.roll(wf, 1, 1),
                         0.0).astype(jnp.bfloat16)
        right = jnp.where(col != W - 1, pltpu.roll(wf, W - 1, 1),
                          0.0).astype(jnp.bfloat16)
        taps = (left, win, right)

        acc = jnp.zeros((RS * W, CO), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                t = taps[dx][dy:dy + RS].reshape(RS * W, C)
                acc = acc + jax.lax.dot_general(
                    t, k_ref[0, 3 * dy + dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        out = acc * mul_ref[0] + add_ref[0, 0]
        out = out * jax.nn.sigmoid(out)
        ob = out.reshape(RS, W, CO).astype(jnp.bfloat16)
        out_ref[0] = ob
        if emit_gap:
            # per-strip (row parity, col parity, channel) sums of the
            # STORED (bf16-rounded) output — a downstream space_to_depth
            # consumer's GAP without re-reading the map from HBM.
            # gap[0, 0, rp, cp·CO + c] = Σ ob[2i+rp, 2j+cp, c]
            of = ob.astype(jnp.float32)
            colp = jax.lax.broadcasted_iota(
                jnp.int32, (RS // 2, W, CO), 1) % 2
            # per-slot 2-D stores (Mosaic has no 1-D vector concat)
            for rp in range(2):
                # row split via major-dim reshape (free), rows 2i+rp
                half = of.reshape(RS // 2, 2, W, CO)[:, rp]
                for cp2 in range(2):
                    s = jnp.where(colp == cp2, half, 0.0).sum(
                        axis=(0, 1)).reshape(1, CO)
                    gap_ref[0, 0, rp:rp + 1,
                            cp2 * CO:(cp2 + 1) * CO] = s

    return kern


def _make_fold_kernel(H, W, C, CO, RS, emit_gap=False):
    """ROW-FOLDED-output variant: out (1, RS/2, W, 2·CO) per strip with
    out[i, j, CO·p + c] = conv[2i+p, j, c] (== ops.fold_soem_neck.rfold
    of the unfolded result) — the narrow-Co form (2·CO lane-exact where
    CO alone would 2x-pad the store).

    Mosaic has no strided vector slices (stride-2 row views verify-fail),
    so the parity split happens at the DMA: ``x`` arrives as the
    (B, H/2, 2, W, C) reshape and EVEN input rows land on scratch rows
    [0, RS/2] while ODD rows land on [RS/2+1, RS+1] (one folded-row halo
    each: even needs E[i0..i0+RS/2], odd O[i0-1..i0+RS/2-1]). Every tap
    of either output parity is then a CONTIGUOUS row slice:

        out par 0, folded row i: rows 2i-1, 2i, 2i+1 = O[i-1], E[i], O[i]
        out par 1:               rows 2i, 2i+1, 2i+2 = E[i], O[i], E[i+1]

    Same total bytes per strip as the plain kernel ((RS+2)·W·C), same
    double-buffered uniform-byte semaphore discipline (boundary strips
    issue a 1-row dummy DMA; the pad rows are zeroed post-wait). The two
    parities run as separate 9-dot accumulations sharing the tap rolls;
    the dots' N=CO may still MXU-pad when CO < 128 — inherent to
    per-sample kernels (no batching dimension is free to pack N)."""
    H2, RS2 = H // 2, RS // 2
    n_s = H2 // RS2

    def kern(x_hbm, k_ref, mul_ref, add_ref, out_ref, *rest):
        if emit_gap:
            gap_ref, win_ref, sem = rest
        else:
            win_ref, sem = rest
        bi = pl.program_id(0)
        si = pl.program_id(1)
        n_b = pl.num_programs(0)
        g = bi * n_s + si
        slot = jax.lax.rem(g, 2)

        def cp(src, dst, sem_):
            pltpu.make_async_copy(src, dst, sem_).start()

        def start(b_, s, dst):
            """Every variant lands exactly (RS+2)·W·C elements."""
            def x_e(r0, n):                   # even input rows
                return x_hbm.at[b_, pl.ds(r0, n), 0]

            def x_o(r0, n):                   # odd input rows
                return x_hbm.at[b_, pl.ds(r0, n), 1]

            def w_e(r0, n):
                return win_ref.at[dst, pl.ds(r0, n)]

            def w_o(r0, n):
                return win_ref.at[dst, pl.ds(RS2 + 1 + r0, n)]

            sm = sem.at[dst]
            if n_s == 1:
                cp(x_e(0, RS2), w_e(0, RS2), sm)
                cp(x_e(0, 1), w_e(RS2, 1), sm)                # dummy
                cp(x_o(0, 1), w_o(0, 1), sm)                  # dummy
                cp(x_o(0, RS2), w_o(1, RS2), sm)
                return

            @pl.when(s == 0)
            def _():
                cp(x_e(0, RS2 + 1), w_e(0, RS2 + 1), sm)
                cp(x_o(0, 1), w_o(0, 1), sm)                  # dummy
                cp(x_o(0, RS2), w_o(1, RS2), sm)

            @pl.when(s == n_s - 1)
            def _():
                i0 = (n_s - 1) * RS2
                cp(x_e(i0, RS2), w_e(0, RS2), sm)
                cp(x_e(H2 - 1, 1), w_e(RS2, 1), sm)           # dummy
                cp(x_o(i0 - 1, RS2 + 1), w_o(0, RS2 + 1), sm)

            @pl.when((s > 0) & (s < n_s - 1))
            def _():
                cp(x_e(s * RS2, RS2 + 1), w_e(0, RS2 + 1), sm)
                cp(x_o(s * RS2 - 1, RS2 + 1), w_o(0, RS2 + 1), sm)

        def wait(dst):
            # uniform-byte wait: (RS2+1)·2·W·C == (RS+2)·W·C elements
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, RS2 + 1)],
                win_ref.at[dst], sem.at[dst]).wait()

        @pl.when(g == 0)
        def _():
            start(bi, 0, 0)

        wait(slot)

        @pl.when(si + 1 < n_s)
        def _():
            start(bi, si + 1, 1 - slot)

        @pl.when((si + 1 == n_s) & (bi + 1 < n_b))
        def _():
            start(bi + 1, 0, 1 - slot)

        # zero the pad rows: O[-1] on the first strip (scratch row
        # RS2+1), E[H2] on the last (scratch row RS2); dummy DMAs above
        # made the byte counts uniform, these rows are conv SAME padding
        zrow = jnp.zeros((1, W, C), jnp.bfloat16)

        @pl.when(si == 0)
        def _():
            win_ref[slot, RS2 + 1:RS2 + 2] = zrow

        @pl.when(si == n_s - 1)
        def _():
            win_ref[slot, RS2:RS2 + 1] = zrow

        win = win_ref[slot]                   # (RS+2, W, C) bf16
        # column taps: rolls are along W only — the two parity blocks
        # stay independent (rows never mix)
        col = jax.lax.broadcasted_iota(jnp.int32, (RS + 2, W, C), 1)
        wf = win.astype(jnp.float32)
        left = jnp.where(col != 0, pltpu.roll(wf, 1, 1),
                         0.0).astype(jnp.bfloat16)
        right = jnp.where(col != W - 1, pltpu.roll(wf, W - 1, 1),
                          0.0).astype(jnp.bfloat16)
        taps = (left, win, right)

        # contiguous scratch-row starts per (parity, dy) — see module
        # comment for the derivation
        starts = ((RS2 + 1, 0, RS2 + 2), (0, RS2 + 2, 1))
        accs = [jnp.zeros((RS2 * W, CO), jnp.float32) for _ in range(2)]
        for dy in range(3):
            for dx in range(3):
                k_tap = k_ref[0, 3 * dy + dx]
                for par in range(2):
                    r0 = starts[par][dy]
                    t = taps[dx][r0:r0 + RS2].reshape(RS2 * W, C)
                    accs[par] = accs[par] + jax.lax.dot_general(
                        t, k_tap,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        outs = []
        for par in range(2):
            o = accs[par] * mul_ref[0] + add_ref[0, 0]
            o = o * jax.nn.sigmoid(o)
            outs.append(o.reshape(RS2, W, CO))
        ob = jnp.concatenate(outs, axis=-1).astype(jnp.bfloat16)
        out_ref[0] = ob
        if emit_gap:
            # per-strip (col parity, folded channel) sums of the STORED
            # (bf16-rounded) folded output — the downstream column-fold
            # consumer's GAP without re-reading the map from HBM.
            # gap[0, 0, cp, fc] = sum_{i, j} ob[i, 2j+cp, fc]
            of = ob.astype(jnp.float32)
            colp = jax.lax.broadcasted_iota(
                jnp.int32, (RS2, W, 2 * CO), 1) % 2
            # per-slot 2-D stores (Mosaic has no 1-D vector concat)
            for cp2 in range(2):
                s = jnp.where(colp == cp2, of, 0.0).sum(
                    axis=(0, 1)).reshape(1, 2 * CO)
                gap_ref[0, 0, cp2:cp2 + 1, :] = s

    return kern


@partial(jax.jit, static_argnames=("rs", "interpret", "fold_out",
                                   "emit_gap"))
def pallas_dyconv(x, kmix, mul, add, rs: int = 16,
                  interpret: bool = False, fold_out: bool = False,
                  emit_gap: bool = False):
    """Per-sample-kernel 3x3 SAME conv + affine + SiLU (module doc).

    x (B, H, W, C) bf16 · kmix (B, 9, C, Co) bf16 · mul (Co,) f32 ·
    add (B, Co) f32 → (B, H, W, Co) bf16.  Constraints: C and Co
    multiples of 128, W a multiple of 8, H a multiple of ``rs``.

    ``fold_out=True`` emits the ROW-FOLDED output (B, H/2, W, 2·Co)
    (== ``ops.fold_soem_neck.rfold`` of the unfolded result) and only
    needs Co a multiple of 64 with 2·Co lane-exact — the narrow-Co
    variant for sites like DySOEM soem_0 (Co=64) whose unfolded store
    would be 2x lane-padded. ``rs`` must be even.

    ``emit_gap=True`` additionally returns per-strip parity-split
    channel sums of the STORED output — (B, H/rs, 2, 2·Co) f32 — so a
    downstream space-to-depth/column-fold consumer's GAP never re-reads
    this map from HBM (sum over axis 1, divide by the pixel count):
    * plain mode: ``gap[b, s, rp, cp·Co + c] = Σ out[b, 2i+rp, 2j+cp, c]``
      (the s2d consumer's (row parity, col parity, channel) order);
    * fold mode:  ``gap[b, s, cp, fc] = Σ out[b, i, 2j+cp, fc]``
      (the column-fold consumer's (col parity, folded channel) order).
    Requires rs even (plain mode needs row pairs inside a strip).
    """
    b, h, w, c = x.shape
    co = kmix.shape[-1]
    assert kmix.shape == (b, 9, c, co), kmix.shape
    assert add.shape == (b, co), add.shape
    assert c % 128 == 0, c
    assert (2 * co if fold_out else co) % 128 == 0, (co, fold_out)
    assert w % 8 == 0, w
    rs = min(rs, h)
    assert h % rs == 0, (h, rs)
    assert not ((fold_out or emit_gap) and rs % 2), rs
    assert not (emit_gap and w % 2), w

    grid = (b, h // rs)
    if fold_out:
        # parity-partitioned DMA source (see _make_fold_kernel)
        x = x.reshape(b, h // 2, 2, w, c)
        kern = _make_fold_kernel(h, w, c, co, rs, emit_gap=emit_gap)
    else:
        kern = _make_kernel(h, w, c, co, rs, emit_gap=emit_gap)
    if fold_out:
        out_spec = pl.BlockSpec((1, rs // 2, w, 2 * co),
                                lambda bi, si: (bi, si, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, h // 2, w, 2 * co),
                                         jnp.bfloat16)
    else:
        out_spec = pl.BlockSpec((1, rs, w, co),
                                lambda bi, si: (bi, si, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, h, w, co), jnp.bfloat16)
    out_specs, out_shapes = out_spec, out_shape
    if emit_gap:
        out_specs = [out_spec,
                     pl.BlockSpec((1, 1, 2, 2 * co),
                                  lambda bi, si: (bi, si, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shapes = [out_shape,
                      jax.ShapeDtypeStruct((b, h // rs, 2, 2 * co),
                                           jnp.float32)]
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # x: manual DMA
            pl.BlockSpec((1, 9, c, co), lambda bi, si: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda bi, si: (0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, co): a (1, 1, co) block's minor dims EQUAL the
            # array's -> satisfies the (8, 128) tiling rule at any B
            pl.BlockSpec((1, 1, co), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, rs + 2, w, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * co * 9,
            bytes_accessed=int(x.size * 2 + b * h * w * co * 2
                               + kmix.size * 2),
            transcendentals=b * h * w * co),
        interpret=interpret,
    )(x, kmix, jnp.asarray(mul, jnp.float32).reshape(1, co),
      jnp.asarray(add, jnp.float32).reshape(b, 1, co))


def mixed_kernel(stacked_kernel, attn, co):
    """(3,3,C,E·Co) stacked expert kernel + (B,E) attention →
    per-sample tap-major (B, 9, C, Co) mixed kernel (linearity of conv
    in the kernel — exactly the contraction the stacked form applies
    AFTER the conv)."""
    kh, kw, c, eco = stacked_kernel.shape
    k = stacked_kernel.reshape(kh * kw, c, eco // co, co)
    return jnp.einsum("tceo,be->btco", k, attn)


def mixed_bias(stacked_bias, attn, co):
    """(E·Co,) stacked bias + (B,E) attention → (B, Co)."""
    return jnp.einsum("eo,be->bo",
                      stacked_bias.reshape(-1, co), attn)
