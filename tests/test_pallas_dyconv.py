"""Per-sample dynamic-conv kernel (ops/pallas_dyconv) parity.

Two-step chain (the repo's standard for bf16 Pallas kernels):
1. the ALGEBRA — mixed-kernel conv == stacked-experts conv + attention
   contraction — is proven at f64 in pure XLA (linearity of conv in
   the kernel);
2. the KERNEL is parity-tested in interpret mode against the XLA
   mixed-kernel formulation on bf16 data (TPU-vs-interpret bitwise
   parity runs on hardware via scripts/dyconv_kernel_probe.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uavdet_tpu.ops.pallas_dyconv import (mixed_bias, mixed_kernel,
                                          pallas_dyconv)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _xla_mixed(x, kmix, mul, add):
    """Reference: per-sample mixed-kernel conv via vmap + the kernel's
    affine+SiLU epilogue."""
    def per_sample(xi, ki, ai):
        k = ki.reshape(3, 3, ki.shape[1], ki.shape[2])
        y = _conv(xi[None], k.astype(xi.dtype))[0]
        o = y.astype(jnp.float32) * mul + ai
        return (o * jax.nn.sigmoid(o)).astype(x.dtype)
    return jax.vmap(per_sample)(x, kmix, add)


def test_mixed_equals_stacked_f64(rng):
    """conv(x, Σ_e attn_e·K_e) == Σ_e attn_e·conv(x, K_e) at f64 —
    the linearity the whole kernel rests on (and exactly what the
    stock DynamicSOEM computes via stacked conv + contraction)."""
    with jax.enable_x64(True):
        B, H, W, C, CO, E = 2, 8, 8, 4, 3, 3
        x = jnp.asarray(rng.normal(size=(B, H, W, C)))
        ks = jnp.asarray(rng.normal(size=(3, 3, C, E * CO)))
        bs = jnp.asarray(rng.normal(size=(E * CO,)))
        attn = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(B, E))), axis=-1)

        # stacked + contract (the stock form)
        y = _conv(x, ks) + bs
        y5 = y.reshape(B, H, W, E, CO)
        stock = jnp.einsum("bhweo,be->bhwo", y5, attn)

        # mixed kernel + mixed bias
        km = mixed_kernel(ks, attn, CO)     # (B, 9, C, CO)
        bm = mixed_bias(bs, attn, CO)       # (B, CO)

        def per_sample(xi, ki, bi_):
            return _conv(xi[None],
                         ki.reshape(3, 3, C, CO))[0] + bi_
        mixed = jax.vmap(per_sample)(x, km, bm)
        np.testing.assert_allclose(np.asarray(mixed), np.asarray(stock),
                                   rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("shape,rs", [
    ((2, 16, 16, 128, 128), 8),    # interior + both boundary strips
    ((2, 8, 16, 128, 128), 8),     # single-strip (n_s == 1)
    ((1, 32, 8, 256, 128), 16),    # C = 2 lane tiles, minimal W
])
def test_kernel_matches_xla_interpret(rng, shape, rs):
    B, H, W, C, CO = shape
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32),
                    jnp.bfloat16)
    kmix = jnp.asarray(
        rng.normal(size=(B, 9, C, CO)).astype(np.float32) * 0.1,
        jnp.bfloat16)
    mul = jnp.asarray(rng.uniform(0.5, 1.5, size=(CO,)), jnp.float32)
    add = jnp.asarray(rng.normal(size=(B, CO)), jnp.float32)

    want = _xla_mixed(x, kmix, mul, add)
    got = pallas_dyconv(x, kmix, mul, add, rs=rs, interpret=True)
    assert got.shape == want.shape and got.dtype == want.dtype
    # bf16 data, f32 accumulation in both — only dot-order noise
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.02, atol=0.02)


@pytest.mark.parametrize("shape,rs", [
    ((2, 16, 16, 128, 64), 8),     # narrow Co: the soem_0 case
    ((2, 8, 16, 128, 64), 8),      # single-strip (n_s == 1)
    ((2, 32, 16, 128, 64), 8),     # 4 strips (interior windows)
    ((1, 16, 8, 128, 128), 8),     # Co already lane-exact
])
def test_fold_out_matches_rfold_of_plain(rng, shape, rs):
    """fold_out emits EXACTLY rfold(plain-mode output): the
    parity-partitioned DMA + contiguous-slice dots reassociate nothing
    (identical dot order per output row), so the comparison is bitwise."""
    from uavdet_tpu.ops.fold_soem_neck import rfold

    B, H, W, C, CO = shape
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32),
                    jnp.bfloat16)
    kmix = jnp.asarray(
        rng.normal(size=(B, 9, C, CO)).astype(np.float32) * 0.1,
        jnp.bfloat16)
    mul = jnp.asarray(rng.uniform(0.5, 1.5, size=(CO,)), jnp.float32)
    add = jnp.asarray(rng.normal(size=(B, CO)), jnp.float32)

    folded = pallas_dyconv(x, kmix, mul, add, rs=rs, interpret=True,
                           fold_out=True)
    assert folded.shape == (B, H // 2, W, 2 * CO)
    if CO % 128 == 0:   # plain mode needs lane-exact Co
        plain = pallas_dyconv(x, kmix, mul, add, rs=rs, interpret=True)
        np.testing.assert_array_equal(np.asarray(folded, np.float32),
                                      np.asarray(rfold(plain),
                                                 np.float32))
    want = rfold(_xla_mixed(x, kmix, mul, add))
    np.testing.assert_allclose(
        np.asarray(folded, np.float32), np.asarray(want, np.float32),
        rtol=0.02, atol=0.02)


@pytest.mark.parametrize("co,fold,h,rs", [
    (64, True, 8, 4),      # soem_0 shape class
    (128, False, 16, 8),   # soem_1 shape class
    (128, True, 16, 8),
])
def test_emit_gap_sums(rng, co, fold, h, rs):
    """emit_gap returns per-strip parity-split channel sums of the
    STORED output (summed over strips == the downstream consumer's GAP
    numerator), and the primary output is bitwise-unchanged."""
    B, W, C = 2, 16, 128
    x = jnp.asarray(rng.normal(size=(B, h, W, C)).astype(np.float32),
                    jnp.bfloat16)
    kmix = jnp.asarray(
        rng.normal(size=(B, 9, C, co)).astype(np.float32) * 0.1,
        jnp.bfloat16)
    mul = jnp.ones((co,), jnp.float32)
    add = jnp.zeros((B, co), jnp.float32)
    ref = pallas_dyconv(x, kmix, mul, add, rs=rs, interpret=True,
                        fold_out=fold)
    out, gap = pallas_dyconv(x, kmix, mul, add, rs=rs, interpret=True,
                             fold_out=fold, emit_gap=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    g = np.asarray(gap.sum(axis=1))
    of = np.asarray(ref, np.float32)
    if fold:
        # (col parity, folded channel)
        want = np.stack([of[:, :, 0::2].sum((1, 2)),
                         of[:, :, 1::2].sum((1, 2))], axis=1)
    else:
        # (row parity, col parity · Co + c)
        want = np.stack(
            [np.concatenate([of[:, p::2, q::2].sum((1, 2))
                             for q in (0, 1)], axis=-1)
             for p in (0, 1)], axis=1)
    np.testing.assert_allclose(g, want.reshape(g.shape),
                               rtol=1e-5, atol=1e-4)


def test_kernel_rejects_bad_shapes(rng):
    x = jnp.zeros((1, 16, 16, 64), jnp.bfloat16)      # C not %128
    k = jnp.zeros((1, 9, 64, 128), jnp.bfloat16)
    with pytest.raises(AssertionError):
        pallas_dyconv(x, k, jnp.ones((128,)), jnp.zeros((1, 128)))
    x = jnp.zeros((1, 16, 16, 128), jnp.bfloat16)     # Co=64 unfolded
    k = jnp.zeros((1, 9, 128, 64), jnp.bfloat16)
    with pytest.raises(AssertionError):
        pallas_dyconv(x, k, jnp.ones((64,)), jnp.zeros((1, 64)))
    with pytest.raises(AssertionError):                # odd rs + fold
        pallas_dyconv(x, k, jnp.ones((64,)), jnp.zeros((1, 64)),
                      rs=1, fold_out=True)
