"""Two-kernel Pallas stem: L1 pass (+ channel sums) then L2 pass.

Why two kernels (see PERF.md): DyConv L2's attention pools the L1
activation globally (GAP), so the mixed L2 kernel matrix cannot exist
before all of L1 is computed. Kernel A produces the L1 activation
(channel-major bf16 in HBM) plus per-strip channel sums; tiny XLA glue
computes attn₂ → the folded L2 matrix; kernel B consumes the activation.

Alignment choreography (Mosaic DMA needs 8-aligned sublane starts):
  * A: x is stored with 8 top pad rows, so each disjoint 64-row output
    strip DMAs x rows [64a, 64a+72) — aligned — and reads its halo at the
    static local offset 7. A emits the activation ROW-PAIR FOLDED —
    (32, RA/2, 2w), lane banks [0:w]=even row, [w:2w]=odd row, the exact
    layout kernel B's stride-2 taps want — plus per-strip channel sums
    (a (32, 128)-padded second output) so the L2 attention GAP never
    re-reads the activation from HBM.
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
    def kern(x_ref, k1_ref, xl1_ref, sums_ref, p1_ref, xs_ref, sem):
        bi = pl.program_id(0)
        ai = pl.program_id(1)
        n_b = pl.num_programs(0)

        def strip_copy(b_, a_, slot):
            p0 = pl.multiple_of(a_ * RA, RA)
            return pltpu.make_async_copy(
                x_ref.at[b_, :, pl.ds(p0, RA + 16), :], xs_ref.at[slot],
                sem.at[slot])

        g = bi * n_a + ai
        slot = jax.lax.rem(g, 2)

        @pl.when(g == 0)
        def _():
            strip_copy(0, 0, 0).start()

        strip_copy(bi, ai, slot).wait()

        @pl.when(ai + 1 < n_a)
        def _():
            strip_copy(bi, ai + 1, 1 - slot).start()

        @pl.when((ai + 1 == n_a) & (bi + 1 < n_b))
        def _():
            strip_copy(bi + 1, 0, 1 - slot).start()

        xs = xs_ref[slot]                     # (3, RA+16, w_pad)

        t = 0
        for ki in range(3):
            for kj in range(3):
                p1_ref[3 * t:3 * (t + 1)] = xs[:, 7 + ki:7 + ki + RA,
                                               kj:kj + w]
                t += 1
        p1_ref[27:28] = jnp.ones((1, RA, w), jnp.bfloat16)

        # f32 accumulator + epilogue: Mosaic requires a 32-bit matmul acc,
        # and its bf16 `logistic` lowering is broken (vector.broadcast
        # element-type verification failure)
        acc1 = jax.lax.dot_general(
            k1_ref[0], p1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (32, RA, w)
        xl1 = acc1 * jax.nn.sigmoid(acc1)

        if h % RA != 0:
            # zero rows beyond the image (array is over-allocated). The
            # conv of the zero-padded rows yields silu(bias) ≠ 0, so this
            # mask is required — but only when strips overhang the image.
            row = jax.lax.broadcasted_iota(jnp.int32, (RA, w), 0) + ai * RA
            mask = jnp.where(row < h, 1.0, 0.0)
            xl1 = xl1 * mask[None]
        xbf = xl1.astype(jnp.bfloat16)
        # row-pair fold: (32, RA, w) → (32, RA/2, 2w) so kernel B's
        # stride-2 taps read even/odd rows as lane banks with NO staging
        xl1_ref[0] = xbf.reshape(32, RA // 2, 2 * w)
        # per-strip channel sums of the STORED bf16 values (so the L2
        # attention GAP sees exactly what kernel B reads) — saves the
        # XLA GAP's full re-read of the activation from HBM. Lanes 1..127
        # of the (32, 128) output block are zero padding.
        srow = jnp.sum(xbf.astype(jnp.float32), axis=2)        # (32, RA)
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
        folded = wf_ref[slot]                      # (32, tr2+8, 2w)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tr2, w), 1)
        not_first = jnp.where(lane >= 1, 1.0, 0.0).astype(jnp.bfloat16)
        not_last = jnp.where(lane < w - 1, 1.0, 0.0).astype(jnp.bfloat16)

        t = 0
        for ki in range(3):
            if ki == 0:
                rows = folded[:, 7:7 + tr2, w:2 * w]
            elif ki == 1:
                rows = folded[:, 8:8 + tr2, 0:w]
            else:
                rows = folded[:, 8:8 + tr2, w:2 * w]
            rows32 = rows.astype(jnp.float32)
            left = (pltpu.roll(rows32, 1, 2).astype(jnp.bfloat16)
                    * not_first[None])
            right = (pltpu.roll(rows32, w - 1, 2).astype(jnp.bfloat16)
                     * not_last[None])
            for tap in (left, rows, right):
                p2_ref[32 * t:32 * (t + 1)] = tap
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
    # rows: 8 top pad; bottom sized so the last strip's 80-row window fits.
    bottom = (n_a - 1) * RA + (RA + 16) - 8 - h
    # Transpose BEFORE the dtype cast: for uint8 frames the NHWC→NCHW
    # relayout moves half the bytes (measured 0.5 ms vs 2.1 ms at
    # bs=16@640) — the /255 normalization is folded into k1_aug by the
    # caller, so uint8 values flow into the matmul directly.
    xt = jnp.pad(x.transpose(0, 3, 1, 2).astype(jnp.bfloat16),
                 ((0, 0), (0, 0), (8, max(bottom, 1)),
                  (1, w_pad - w - 1)))

    xl1, strip_sums = pl.pallas_call(
        make_l1_kernel(w, h, w_pad, n_a),
        grid=(b, n_a),
        in_specs=[
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
            pltpu.VMEM((28, RA, w), jnp.bfloat16),
            pltpu.VMEM((2, 3, RA + 16, w_pad), jnp.bfloat16),  # dbl-buf
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(xt, k1_aug.astype(jnp.bfloat16))
    # GAP = Σ strips of the in-kernel per-strip channel sums (a few KB)
    # instead of an XLA reduce that re-reads the whole activation
    sums = jnp.sum(strip_sums[:, :, :, 0], axis=1)
    return xl1, sums


@partial(jax.jit, static_argnames=("h", "over_rows", "raw_cm", "interpret",
                                   "fold"))
def pallas_l2(xl1, k2_aug, h: int = None, over_rows: int = 0,
              raw_cm: bool = False, interpret: bool = False,
              fold: int = 1):
    """xl1 (B,32,Hp/2,2W) folded bf16 from pallas_l1 → (B,H/2,W/2,64) NHWC.

    ``h`` is the TRUE image height; pallas_l1 over-allocates
    Hp = ceil(H/64)·64 + 24, so it cannot be recovered from the array shape
    unless H is divisible by 64. H must be divisible by 16; the strip
    height doubles to 16 when H is divisible by 32 (fewer, bigger
    programs — the kernel is per-program-overhead-bound, not
    bandwidth-bound).

    ``over_rows``: extra unwritten rows past H/2 in the output allocation
    (a downstream strip kernel's aligned read window, e.g.
    ``pallas_block.pallas_block_down`` wants 8). ``raw_cm``: return the
    raw (B, 64, H/2 + over_rows, ceil(W/2 /128)·128) channel-major array
    — lanes past W/2 are zero — instead of the sliced NHWC transpose.

    ``fold``: emit the image-FOLDED NHWC layout (B/fold, H/2, W/2,
    fold·64) for ``ops.imgfold`` instead of plain NHWC — the same single
    relayout the NHWC transpose costs anyway, so the fold is free."""
    b, _, hp2, w2 = xl1.shape
    w = w2 // 2
    if h is None:
        h = 2 * hp2 - 24  # exact only when H was divisible by 64
    if h % 16 != 0:
        raise ValueError(f"pallas_l2 needs H divisible by 16, got {h}")
    tr2 = next(t for t in (32, 16, 8) if (h // 2) % t == 0)
    n_s = (h // 2) // tr2
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
    if fold > 1:
        h2, w2 = h // 2, w // 2
        return out[:, :, :h2].reshape(
            b // fold, fold, 64, h2, w2).transpose(
            0, 3, 4, 1, 2).reshape(b // fold, h2, w2, fold * 64)
    return out[:, :, :h // 2].transpose(0, 2, 3, 1)


def fused_stem_forward(x, dy0_params, dy0_stats, dy1_params, dy1_stats,
                       attn_temp: float, interpret: bool = False,
                       block_aug=None, imgfold=None):
    """Full two-pass fused stem from DyYOLO parameter trees.

    ``block_aug``: optional (w1_aug, k2_aug, k3_aug) folded matrices from
    ``pallas_block.fold_cnnblock`` — when given, the post-stem
    ResidualBlock + 3x3-s2 downsample also run fused
    (``pallas_block_down``) and the result is (B, H/4, W/4, 128) NHWC.

    ``imgfold``: optional (rb_params, rb_stats, down_params, down_stats)
    trees — the same post-stem ResidualBlock + downsample run on the
    image-FOLDED layout instead (``ops.imgfold``: 4 images stacked on
    lanes, block-diagonal kernels, zero lane padding; exact numerics) and
    the result is (B, H/4, W/4, 128) NHWC. Mutually exclusive with
    ``block_aug``.

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

    if imgfold is not None:
        from .imgfold import folded_block_down, unfold_images
        rb_p, rb_s, dn_p, dn_s = imgfold
        fold = 4 if b % 4 == 0 else 1
        xf = pallas_l2(xl1, k2, h=h, interpret=interpret, fold=fold)
        yf = folded_block_down(xf, rb_p, rb_s, dn_p, dn_s, fold,
                               dtype=jnp.bfloat16)
        return unfold_images(yf, fold)

    if block_aug is None:
        return pallas_l2(xl1, k2, h=h, interpret=interpret)

    from .pallas_block import pallas_block_down
    xl2 = pallas_l2(xl1, k2, h=h, over_rows=8, raw_cm=True,
                    interpret=interpret)
    out = pallas_block_down(xl2, *block_aug, h2=h // 2, w=w // 2,
                            interpret=interpret)
    return out.transpose(0, 2, 3, 1)


def detector_stem_fast_path(model, variables, layer_config, attn_temp,
                            interpret: bool = False,
                            input_size: int = None):
    """Build the Pallas-stem fast path for a DyYOLO-style detector.

    Returns (stem_fn, tail_model, tail_variables) where
    ``stem_fn(x_preprocessed)`` runs the fused front of the network and
    ``tail_model.apply(tail_variables, stem_out)`` runs the rest — or None
    if the config doesn't start with the DyConv(32,3,1), DyConv(64,3,2)
    stem this kernel implements.

    When the next two tokens are ["B", 1], [128, 3, 2] (the DyYOLO
    default), they are consumed too: the post-stem ResidualBlock +
    downsample run in ``pallas_block.pallas_block_down`` with BN/bias
    folded at build time, and the tail starts at H/4 — the stem's two
    layers plus these two were the farthest-from-roofline layers of the
    whole pipeline (PERF.md).

    The tail model is the same interpreter over the remaining tokens; its
    auto-assigned module names shift by exactly the consumed module
    counts per flax type, so the variables tree is re-keyed accordingly.
    """
    cfg = [list(t) for t in layer_config]
    if len(cfg) < 2 or cfg[0] != ["DyConv", 32, 3, 1] \
            or cfg[1] != ["DyConv", 64, 3, 2]:
        return None

    from ..models.dy_yolo import DyYOLO

    p = variables["params"]["net"]
    s = variables["batch_stats"]["net"]

    import os

    # The post-stem ResidualBlock + 3x3-s2 downsample tokens can be
    # consumed by one of two OPTIONAL fast paths — both fully tested,
    # both measured SLOWER than plain XLA end-to-end, kept as documented
    # negative results (PERF.md):
    #  * imgfold (UAVDET_IMGFOLD=1; pure XLA): 4 images stacked on lanes
    #    with block-diagonal kernels (ops/imgfold.py). Exact numerics and
    #    the fold relayout is free (replaces the NHWC transpose), but the
    #    block-diagonal 3x3 kernels carry 4× the real MXU FLOPs, which
    #    outweighs the lane-padding traffic it saves (bench r3: 449.6 vs
    #    480.5 fps).
    #  * pallas_block kernel (UAVDET_PALLAS_BLOCK=1; needs H % 32 == 0):
    #    bit-exact, but strip-kernel per-program overhead eats the fusion
    #    win (12.5 vs 9.2 ms standalone at bs=16 @640).
    tokens_match = (len(cfg) >= 4 and cfg[2] == ["B", 1]
                    and cfg[3] == [128, 3, 2])
    with_block = (tokens_match
                  and input_size is not None and input_size % 32 == 0
                  and os.environ.get("UAVDET_PALLAS_BLOCK", "0") == "1")
    with_imgfold = (tokens_match and not with_block
                    and os.environ.get("UAVDET_IMGFOLD", "0") == "1")
    shifts = {"DyConvModule_": 2}
    if with_block or with_imgfold:
        shifts.update({"ResidualBlock_": 1, "CNNBlock_": 1})

    def rekey(tree):
        out = {}
        for k, v in tree.items():
            for prefix, shift in shifts.items():
                if k.startswith(prefix):
                    i = int(k.split("_")[-1])
                    if i >= shift:
                        out[f"{prefix}{i - shift}"] = v
                    break
            else:
                out[k] = v
        return out

    tail_variables = {
        "params": {"net": rekey(p)},
        "batch_stats": {"net": rekey(s)},
    }
    n_skip = 4 if (with_block or with_imgfold) else 2
    tail_model = DyYOLO(layer_config=tuple(tuple(t) for t in cfg[n_skip:]),
                        attn_temperature=attn_temp,
                        n_anchors=model.n_anchors, dtype=model.dtype)

    dy0p, dy0s = p["DyConvModule_0"], s["DyConvModule_0"]
    dy1p, dy1s = p["DyConvModule_1"], s["DyConvModule_1"]

    block_aug = None
    if with_block:
        from .pallas_block import fold_cnnblock
        rb_p, rb_s = p["ResidualBlock_0"], s["ResidualBlock_0"]
        block_aug = (
            fold_cnnblock(rb_p["CNNBlock_0"], rb_s["CNNBlock_0"]),
            fold_cnnblock(rb_p["CNNBlock_1"], rb_s["CNNBlock_1"]),
            fold_cnnblock(p["CNNBlock_0"], s["CNNBlock_0"]),
        )

    imgfold = None
    if with_imgfold:
        imgfold = (p["ResidualBlock_0"], s["ResidualBlock_0"],
                   p["CNNBlock_0"], s["CNNBlock_0"])

    def stem_fn(x):
        return fused_stem_forward(x, dy0p, dy0s, dy1p, dy1s, attn_temp,
                                  interpret=interpret,
                                  block_aug=block_aug, imgfold=imgfold)

    return stem_fn, tail_model, tail_variables
