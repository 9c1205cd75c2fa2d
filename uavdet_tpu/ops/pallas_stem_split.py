"""Two-kernel Pallas stem: L1 pass (+ channel sums) then L2 pass.

Why two kernels (see PERF.md): DyConv L2's attention pools the L1
activation globally (GAP), so the mixed L2 kernel matrix cannot exist
before all of L1 is computed. Kernel A produces the L1 activation
(channel-major bf16 in HBM) plus per-strip channel sums; tiny XLA glue
computes attn₂ → the folded L2 matrix; kernel B consumes the activation.

Alignment choreography (Mosaic DMA needs 8-aligned sublane starts):
  * A: x is stored with 8 top pad rows, so each disjoint 64-row output
    strip DMAs x rows [64a, 64a+72) — aligned — and reads its halo at the
    static local offset 7.
  * B: needs L1 rows [16·s − 1, 16·s + 17). Two DMAs into one scratch:
    the previous 8 rows [16s−8, 16s) (skipped and zero-filled for s=0)
    and the current 24 rows [16s, 16s+24), giving the halo at static
    local offset 7. The activation array is over-allocated by 24 rows so
    the bottom strip's window stays in bounds; out-of-image rows are
    zero-masked in-kernel (they realize the conv's zero padding).

Kernel matrices come from ``pallas_stem.mix_and_fold`` (expert mixing +
BN + bias folded; bias as a ones-row contraction element).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RA = 64          # L1 rows per kernel-A strip
TR2 = 8          # L2 rows per kernel-B strip


def make_l1_kernel(w: int, h: int, w_pad: int):
    def kern(x_ref, k1_ref, xl1_ref, p1_ref, xs_ref, sem):
        bi = pl.program_id(0)
        ai = pl.program_id(1)

        p0 = pl.multiple_of(ai * RA, RA)
        dma = pltpu.make_async_copy(
            x_ref.at[bi, :, pl.ds(p0, RA + 16), :], xs_ref, sem)
        dma.start()
        dma.wait()
        xs = xs_ref[...]                      # (3, RA+16, w_pad)

        t = 0
        for ki in range(3):
            for kj in range(3):
                p1_ref[3 * t:3 * (t + 1)] = xs[:, 7 + ki:7 + ki + RA,
                                               kj:kj + w]
                t += 1
        p1_ref[27:28] = jnp.ones((1, RA, w), jnp.bfloat16)

        acc1 = jax.lax.dot_general(
            k1_ref[0], p1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (32, RA, w)
        xl1 = acc1 * jax.nn.sigmoid(acc1)

        # zero rows beyond the image (array is over-allocated)
        row = jax.lax.broadcasted_iota(jnp.int32, (RA, w), 0) + ai * RA
        mask = jnp.where(row < h, 1.0, 0.0)
        xl1 = xl1 * mask[None]

        xl1_ref[0] = xl1.astype(jnp.bfloat16)
    return kern


def make_l2_kernel(w: int, h: int, w_pad: int):
    half = w // 2

    def kern(a_ref, k2_ref, out_ref, p2_ref, xw_ref, folded_ref, sem0, sem1):
        bi = pl.program_id(0)
        si = pl.program_id(1)
        n_s = pl.num_programs(1)

        # Double-buffered window DMA: strip si's 32-row window
        # [16·si − 8, 16·si + 24) was started during strip si−1 (saves the
        # DMA stall — measured 12.5 → 10.0 ms at bs=16 @640). Strip 0's
        # top 8 rows don't exist (zero-filled: they realize the conv's top
        # padding) so its copy covers only the 24 current rows.
        def start_dma(s, slot):
            @pl.when(s == 0)
            def _():
                pltpu.make_async_copy(
                    a_ref.at[bi, :, pl.ds(0, 24), :],
                    xw_ref.at[slot, :, 8:32, :], sem0.at[slot]).start()

            @pl.when(s > 0)
            def _():
                start = pl.multiple_of(s * 2 * TR2 - 8, 8)
                pltpu.make_async_copy(
                    a_ref.at[bi, :, pl.ds(start, 32), :],
                    xw_ref.at[slot, :, 0:32, :], sem0.at[slot]).start()

        @pl.when(si == 0)
        def _():
            xw_ref[0, :, 0:8, :] = jnp.zeros((32, 8, w_pad), jnp.bfloat16)
            start_dma(si, 0)

        slot = si % 2

        @pl.when(si == 0)
        def _():
            pltpu.make_async_copy(
                a_ref.at[bi, :, pl.ds(0, 24), :],
                xw_ref.at[0, :, 8:32, :], sem0.at[0]).wait()

        @pl.when(si > 0)
        def _():
            start = pl.multiple_of(si * 2 * TR2 - 8, 8)
            pltpu.make_async_copy(
                a_ref.at[bi, :, pl.ds(start, 32), :],
                xw_ref.at[slot, :, 0:32, :], sem0.at[slot]).wait()

        @pl.when(si + 1 < n_s)
        def _():
            start_dma(si + 1, (si + 1) % 2)

        # local L1 rows for L2 taps: l = 16·si − 1 + j ↔ local 7 + j
        # zero out-of-image rows (bottom garbage / top pad)
        xl1 = xw_ref[slot, :, :, 0:w]
        row = jax.lax.broadcasted_iota(jnp.int32, (32, w), 0) + (
            si * 2 * TR2 - 8)
        mask = jnp.where((row >= 0) & (row < h), 1.0, 0.0).astype(
            jnp.bfloat16)
        folded_ref[...] = (xl1 * mask[None]).reshape(32, 16, 2 * w)

        folded = folded_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (TR2, w), 1)
        not_first = jnp.where(lane >= 1, 1.0, 0.0).astype(jnp.bfloat16)
        not_last = jnp.where(lane < w - 1, 1.0, 0.0).astype(jnp.bfloat16)

        # rows of the fold: local row 7+j for j = ki + 2ρ, ρ ∈ [0, TR2):
        # local = 7+ki+2ρ; parity: (7+ki+2ρ) odd for ki even → odd bank,
        # fold row (7+ki)/2 rounding... enumerate per ki:
        #   ki=0: local 7,9,..,37  → odd bank rows 3..18? local//2 = 3+ρ
        #   ki=1: local 8,10,..,38 → even bank rows 4+ρ
        #   ki=2: local 9,11,..,39 → odd bank rows 4+ρ
        t = 0
        for ki in range(3):
            if ki == 0:
                rows = folded[:, 3:3 + TR2, w:2 * w]
            elif ki == 1:
                rows = folded[:, 4:4 + TR2, 0:w]
            else:
                rows = folded[:, 4:4 + TR2, w:2 * w]
            rows32 = rows.astype(jnp.float32)
            left = (pltpu.roll(rows32, 1, 2).astype(jnp.bfloat16)
                    * not_first[None])
            right = (pltpu.roll(rows32, w - 1, 2).astype(jnp.bfloat16)
                     * not_last[None])
            for tap in (left, rows, right):
                p2_ref[32 * t:32 * (t + 1)] = tap
                t += 1
        p2_ref[288:289] = jnp.ones((1, TR2, w), jnp.bfloat16)

        acc2 = jax.lax.dot_general(
            k2_ref[0], p2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (64, TR2, w)
        col = jax.lax.broadcasted_iota(jnp.int32, (w, half), 0)
        tgt = jax.lax.broadcasted_iota(jnp.int32, (w, half), 1)
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
    """x (B,H,W,3) → (xl1 (B,32,Hp,W) bf16 channel-major, sums (B,32) f32).

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

    xl1 = pl.pallas_call(
        make_l1_kernel(w, h, w_pad),
        grid=(b, n_a),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 32, 28), lambda bi, ai: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 32, RA, w),
                               lambda bi, ai: (bi, 0, ai, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 32, hp, w), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((28, RA, w), jnp.bfloat16),
            pltpu.VMEM((3, RA + 16, w_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xt, k1_aug.astype(jnp.bfloat16))
    # GAP sums in XLA over the valid rows only (the 24 over-allocated
    # rows at the bottom are never written — undefined content)
    sums = jnp.sum(xl1[:, :, :h, :].astype(jnp.float32), axis=(2, 3))
    return xl1, sums


@partial(jax.jit, static_argnames=("h", "interpret"))
def pallas_l2(xl1, k2_aug, h: int = None, interpret: bool = False):
    """xl1 (B,32,Hp,W) bf16 from pallas_l1 → (B, H/2, W/2, 64) NHWC.

    ``h`` is the TRUE image height; pallas_l1 over-allocates
    Hp = ceil(H/64)·64 + 24, so it cannot be recovered from the array shape
    unless H is divisible by 64. H must be divisible by 2·TR2 = 16 (the
    kernel emits whole TR2-row output strips)."""
    b, _, hp, w = xl1.shape
    if h is None:
        h = hp - 24  # exact only when H was divisible by 64
    if h % (2 * TR2) != 0:
        raise ValueError(f"pallas_l2 needs H divisible by {2 * TR2}, got {h}")
    w_pad = -(-w // 128) * 128
    if w_pad != w:
        xl1 = jnp.pad(xl1, ((0, 0), (0, 0), (0, 0), (0, w_pad - w)))
    n_s = (h // 2) // TR2

    out = pl.pallas_call(
        make_l2_kernel(w, h, w_pad),
        grid=(b, n_s),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 64, 289), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 64, TR2, w // 2),
                               lambda bi, si: (bi, 0, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 64, h // 2, w // 2),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((289, TR2, w), jnp.bfloat16),
            pltpu.VMEM((2, 32, 32, w_pad), jnp.bfloat16),  # 2 DMA slots
            pltpu.VMEM((32, 16, 2 * w), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xl1, k2_aug.astype(jnp.bfloat16))
    return out.transpose(0, 2, 3, 1)


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
                            interpret: bool = False):
    """Build the Pallas-stem fast path for a DyYOLO-style detector.

    Returns (stem_fn, tail_model, tail_variables) where
    ``stem_fn(x_preprocessed)`` runs the two fused stem layers and
    ``tail_model.apply(tail_variables, stem_out)`` runs the rest — or None
    if the config doesn't start with the DyConv(32,3,1), DyConv(64,3,2)
    stem this kernel implements.

    The tail model is the same interpreter over ``layer_config[2:]``; its
    auto-assigned module names shift by exactly the two consumed
    DyConvModules, so the variables tree is re-keyed accordingly.
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
                i = int(k.split("_")[1])
                if i < 2:
                    continue
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
