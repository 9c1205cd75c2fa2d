"""Pallas TPU kernel: fused DyYOLO stem (two dynamic convs + BN + SiLU).

The first two dynamic convolutions dominate DyYOLO inference (~19 ms of
41 ms at bs=16/640px): XLA's conv pads the tiny in-channel contraction to
128 lanes and ping-pongs layouts between the conv, the expert contraction
and SiLU (PERF.md). This kernel computes

    L1: dyconv 3→32, k3 s1  + BN + SiLU
    L2: dyconv 32→64, k3 s2 + BN + SiLU

strip-by-strip entirely in VMEM — the L1 activation (420 MB at bs=16)
never touches HBM. Both convs run on the MXU as ``K (O, 9I+1) @ patches``
contractions; the per-sample expert mixing, the inference BatchNorm affine
AND the bias are folded into the kernel matrices on the XLA side (bias as
an extra contraction element against a constant ones-row patch).

Mosaic lowering notes (hard-won):
  * strided slices lower to unsupported gathers → stride-2 row selection
    uses the (R, W) → (R/2, 2W) reshape (even rows in lanes [0,W), odd in
    [W,2W)); column parity is resolved by a 0/1 even-column selection
    matmul after a stride-1 conv along W;
  * jnp.pad/slice lane shifts lower to concats with mismatched operand
    offsets → ``pltpu.roll`` + edge masks instead;
  * computed values carry internal layout offsets that reshape/concat
    reject → patch tensors are staged through VMEM scratch buffers
    (stores normalize layout).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stem_kernel(x_ref, k1_ref, k2_ref, out_ref, p1_ref, xl1_ref, p2_ref,
                 xs_ref, dma_sem, *, tr2: int, w: int, h: int):
    bi = pl.program_id(0)
    si = pl.program_id(1)
    r1 = 2 * tr2 + 1              # L1 rows this strip contributes
    half = w // 2

    # x stays in HBM; DMA only this strip's rows (+halo) into VMEM —
    # a full-image VMEM block would be re-fetched per strip (~3 MB × 40).
    # DMA row counts must be 8-aligned; extra rows are fetched and ignored.
    rows_dma = -(-(r1 + 2) // 8) * 8
    p0 = pl.multiple_of(si * 2 * tr2, 2 * tr2)
    dma = pltpu.make_async_copy(
        x_ref.at[bi, :, pl.ds(p0, rows_dma), :], xs_ref, dma_sem)
    dma.start()
    dma.wait()
    xs = xs_ref[...]                           # (3, rows_dma, w+2)

    # ---- L1 patches (27+1, r1, w) staged via scratch → MXU -------------
    t = 0
    for ki in range(3):
        for kj in range(3):
            p1_ref[3 * t:3 * (t + 1)] = xs[:, ki:ki + r1, kj:kj + w]
            t += 1
    p1_ref[27:28] = jnp.ones((1, r1, w), jnp.bfloat16)  # bias row

    k1 = k1_ref[0]                              # (32, 28) bf16
    acc1 = jax.lax.dot_general(
        k1, p1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)     # (32, r1, w)
    xl1 = acc1 * jax.nn.sigmoid(acc1)           # SiLU, f32

    # zero-mask L1 rows outside the image (they realize L2's zero pad):
    # global L1 row l = 2·R0 − 1 + local
    row = jax.lax.broadcasted_iota(jnp.int32, (r1, w), 0) + (
        2 * si * tr2 - 1)
    mask = jnp.where((row >= 0) & (row < h), 1.0, 0.0)
    xl1_ref[:, 0:r1, :] = (xl1 * mask[None, :, :]).astype(jnp.bfloat16)
    xl1_ref[:, r1:r1 + 1, :] = jnp.zeros((32, 1, w), jnp.bfloat16)

    # ---- L2 -------------------------------------------------------------
    # row-pair fold: even rows → lanes [0, w), odd rows → [w, 2w)
    folded = xl1_ref[...].reshape(32, (r1 + 1) // 2, 2 * w)

    lane = jax.lax.broadcasted_iota(jnp.int32, (tr2, w), 1)
    not_first = jnp.where(lane >= 1, 1.0, 0.0).astype(jnp.bfloat16)
    not_last = jnp.where(lane < w - 1, 1.0, 0.0).astype(jnp.bfloat16)
    t = 0
    for ki in range(3):
        # rows ki, ki+2, ..., ki+2·(tr2−1) of xl1 via the fold
        if ki == 0:
            rows = folded[:, 0:tr2, 0:w]
        elif ki == 1:
            rows = folded[:, 0:tr2, w:2 * w]
        else:
            rows = folded[:, 1:tr2 + 1, 0:w]
        # pltpu.roll requires 32-bit data → roll in f32, cast back
        rows32 = rows.astype(jnp.float32)
        left = (pltpu.roll(rows32, 1, 2).astype(jnp.bfloat16)
                * not_first[None])
        right = (pltpu.roll(rows32, w - 1, 2).astype(jnp.bfloat16)
                 * not_last[None])
        for tap in (left, rows, right):            # kj = 0, 1, 2
            p2_ref[32 * t:32 * (t + 1)] = tap
            t += 1
    p2_ref[288:289] = jnp.ones((1, tr2, w), jnp.bfloat16)  # bias row

    k2 = k2_ref[0]                                 # (64, 289) bf16
    acc2 = jax.lax.dot_general(
        k2, p2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (64, tr2, w) stride-1
    # even-column selection on the MXU: contract lanes with (w, w/2) 0/1
    col = jax.lax.broadcasted_iota(jnp.int32, (w, half), 0)
    tgt = jax.lax.broadcasted_iota(jnp.int32, (w, half), 1)
    sel = jnp.where(col == 2 * tgt, 1.0, 0.0)
    acc2 = jax.lax.dot_general(
        acc2, sel,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (64, tr2, w/2)
    out_ref[0] = (acc2 * jax.nn.sigmoid(acc2)).astype(jnp.bfloat16)


def mix_and_fold(experts, attn, bn_scale, bn_bias, bn_mean, bn_var,
                 out_channels: int):
    """XLA-side prep: per-sample expert mixing + BN folding, with the bias
    appended as an extra contraction column (ones-row patch trick).

    experts: (k, k, I, E·O) param; attn: (B, E) softmax weights.
    → k_aug (B, O, k²·I + 1) f32.
    """
    kk, _, i_ch, eo = experts.shape
    e = eo // out_channels
    e5 = experts.reshape(kk * kk * i_ch, e, out_channels).astype(jnp.float32)
    mixed = jnp.einsum("peo,be->bop", e5, attn.astype(jnp.float32))
    inv = (bn_scale / jnp.sqrt(bn_var + 1e-5)).astype(jnp.float32)
    k_f = mixed * inv[None, :, None]
    b_f = (bn_bias - bn_mean * inv).astype(jnp.float32)
    b_col = jnp.broadcast_to(b_f[None, :, None],
                             (attn.shape[0], out_channels, 1))
    return jnp.concatenate([k_f, b_col], axis=-1)


@partial(jax.jit, static_argnames=("tr2", "interpret"))
def pallas_dyconv_stem(x, k1_aug, k2_aug, tr2: int = 16,
                       interpret: bool = False):
    """x: (B, H, W, 3) in [0,1]; k1_aug (B,32,28), k2_aug (B,64,289) from
    ``mix_and_fold``. → (B, H/2, W/2, 64) bf16 NHWC (both stem layers)."""
    b, h, w, _ = x.shape
    n_strips = (h // 2) // tr2
    r1 = 2 * tr2 + 1
    rows_dma = -(-(r1 + 2) // 8) * 8
    w_pad = -(-(w + 2) // 128) * 128          # DMA lanes must be 128-aligned
    # channel-major; rows padded so strip si reads rows [2·tr2·si, +rows_dma)
    bottom = max(3, 2 * tr2 * (n_strips - 1) + rows_dma - h - 2)
    xt = jnp.pad(x.astype(jnp.bfloat16).transpose(0, 3, 1, 2),
                 ((0, 0), (0, 0), (2, bottom), (1, w_pad - w - 1)))
    out = pl.pallas_call(
        partial(_stem_kernel, tr2=tr2, w=w, h=h),
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
            pl.BlockSpec((1, 32, 28), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64, 289), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 64, tr2, w // 2),
                               lambda bi, si: (bi, 0, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 64, h // 2, w // 2),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((28, r1, w), jnp.bfloat16),          # L1 patches
            pltpu.VMEM((32, r1 + 1, w), jnp.bfloat16),      # padded L1 act
            pltpu.VMEM((289, tr2, w), jnp.bfloat16),        # L2 patches
            pltpu.VMEM((3, rows_dma, w_pad), jnp.bfloat16),  # x strip
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xt, k1_aug.astype(jnp.bfloat16), k2_aug.astype(jnp.bfloat16))
    return out.transpose(0, 2, 3, 1)  # → NHWC
