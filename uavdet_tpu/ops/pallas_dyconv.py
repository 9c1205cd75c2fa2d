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


def _make_kernel(H, W, C, CO, RS):
    n_s = H // RS

    def kern(x_hbm, k_ref, mul_ref, add_ref, out_ref, win_ref, sem):
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

        out = acc * mul_ref[0] + add_ref[0]
        out = out * jax.nn.sigmoid(out)
        out_ref[0] = out.reshape(RS, W, CO).astype(jnp.bfloat16)

    return kern


@partial(jax.jit, static_argnames=("rs", "interpret"))
def pallas_dyconv(x, kmix, mul, add, rs: int = 16,
                  interpret: bool = False):
    """Per-sample-kernel 3x3 SAME conv + affine + SiLU (module doc).

    x (B, H, W, C) bf16 · kmix (B, 9, C, Co) bf16 · mul (Co,) f32 ·
    add (B, Co) f32 → (B, H, W, Co) bf16.  Constraints: C and Co
    multiples of 128, W a multiple of 8, H a multiple of ``rs``.
    """
    b, h, w, c = x.shape
    co = kmix.shape[-1]
    assert kmix.shape == (b, 9, c, co), kmix.shape
    assert add.shape == (b, co), add.shape
    assert c % 128 == 0 and co % 128 == 0, (c, co)
    assert w % 8 == 0, w
    rs = min(rs, h)
    assert h % rs == 0, (h, rs)

    grid = (b, h // rs)
    kern = _make_kernel(h, w, c, co, rs)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # x: manual DMA
            pl.BlockSpec((1, 9, c, co), lambda bi, si: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda bi, si: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda bi, si: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rs, w, co),
                               lambda bi, si: (bi, si, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), jnp.bfloat16),
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
      jnp.asarray(add, jnp.float32))


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
