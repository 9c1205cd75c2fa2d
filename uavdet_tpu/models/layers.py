"""Shared model blocks — flax.linen, NHWC layout (TPU-native).

TPU-first re-designs of the reference blocks (model/_base.py):

* ``ConvModule``   — Conv→BN→SiLU/ReLU          (reference :14-24)
* ``CNNBlock``     — Conv→BN→LeakyReLU(0.1)     (BaselineModel.py:10-22)
* ``ResidualBlock``                              (BaselineModel.py:25-45)
* ``ScalePrediction``                            (BaselineModel.py:47-53)
* ``DyConvModule`` — dynamic (conditional) convolution (reference :26-77).
  The reference aggregates a per-sample kernel and applies it with cuDNN's
  ``groups=batch_size`` trick — which does not map to XLA convs. Because
  convolution is LINEAR in the kernel, we instead run ONE convolution whose
  output channels are all E experts stacked (a single large MXU matmul) and
  contract the expert axis with the per-sample attention weights:

      conv(x_b, Σ_e a_be W_e) = Σ_e a_be conv(x_b, W_e)

  This is mathematically identical (tested vs the mix-then-conv form) and
  keeps the MXU busy with one big conv instead of B small grouped ones.
* ``ObjectnessHead`` / ``BBoxHead`` / ``YOLOHead`` (reference :80-153) —
  heads output the reference's (B, A, H, W, C) layout; logits, no sigmoid
  (loss consumes logits, reference :96-97).

BatchNorm: torch defaults are eps=1e-5, momentum=0.1 — flax's ``momentum``
is the running-average retention factor, so torch 0.1 ≡ flax 0.9.
"""

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.fastconv import fast_conv3x3, use_fast_conv3x3
from ..utils.datatypes import DetectionResults


def _pad(padding) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    return tuple((p, p) for p in padding)


def _stride1(stride) -> int:
    return stride[0] if isinstance(stride, (tuple, list)) else stride


class _FastConv3x3(nn.Module):
    """Drop-in for nn.Conv(3x3, pad 1) on small input channels, computed via
    the patchified-matmul rewrite (ops/fastconv.py). Parameter tree is
    identical to nn.Conv ('kernel' [+ 'bias']), so checkpoints interchange.
    """

    features: int
    stride: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, in_c, self.features))
        y = fast_conv3x3(x.astype(self.dtype), kernel.astype(self.dtype),
                         self.stride)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,)).astype(y.dtype)
        return y


def _conv_or_fast(x, features, kernel_size, stride, padding, use_bias,
                  dtype, name: str):
    """Pick the fast path when shapes qualify; fall back to nn.Conv."""
    s = _stride1(stride)
    ks = kernel_size if isinstance(kernel_size, (tuple, list)) \
        else (kernel_size, kernel_size)
    pad_ok = (padding == 1 or padding == (1, 1))
    div = (s == 2 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0) or \
          (s == 1 and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0)
    if use_fast_conv3x3(x.shape[-1], ks, s) and pad_ok and div:
        return _FastConv3x3(features, stride=s, use_bias=use_bias,
                            dtype=dtype or jnp.float32, name=name)(x)
    return nn.Conv(features, ks, strides=stride, padding=_pad(padding),
                   use_bias=use_bias, dtype=dtype, name=name)(x)


class ConvModule(nn.Module):
    """Conv → BatchNorm → SiLU/ReLU (reference model/_base.py:14-24)."""

    out_channels: int
    kernel_size: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    padding: int = 0
    activation: str = "silu"
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, self.kernel_size,
                    strides=self.stride, padding=_pad(self.padding),
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=self.bn_eps,
                         dtype=self.dtype)(x)
        return nn.silu(x) if self.activation == "silu" else nn.relu(x)


class CNNBlock(nn.Module):
    """Conv → BN → LeakyReLU(0.1) (reference BaselineModel.py:10-22)."""

    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: int = 0
    bn_act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv_or_fast(x, self.out_channels, self.kernel_size,
                          self.stride, self.padding,
                          use_bias=not self.bn_act, dtype=self.dtype,
                          name="Conv_0")
        if self.bn_act:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype)(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
        return x


class ResidualBlock(nn.Module):
    """num_repeats × (1x1 half-channels → 3x3 restore) with optional skip
    (reference BaselineModel.py:25-45)."""

    channels: int
    use_residual: bool = True
    num_repeats: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.num_repeats):
            y = CNNBlock(self.channels // 2, kernel_size=(1, 1),
                         dtype=self.dtype)(x, train)
            y = CNNBlock(self.channels, kernel_size=(3, 3), padding=1,
                         dtype=self.dtype)(y, train)
            x = y + x if self.use_residual else y
        return x


class ScalePrediction(nn.Module):
    """3x3 channel-doubling conv feeding a detection tap
    (reference BaselineModel.py:47-53)."""

    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return CNNBlock(2 * self.in_channels, kernel_size=(3, 3),
                        padding=1, dtype=self.dtype)(x, train)


class DyConvModule(nn.Module):
    """Dynamic convolution as a stacked-expert conv + attention contraction.

    Numerically equals the reference's mix-then-grouped-conv
    (model/_base.py:54-77): softmax(GAP-MLP / attn_temp) over E experts,
    conv with the attention-mixed kernel, then BN → SiLU.
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    num_experts: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_temp: float = 1.0, train: bool = False):
        in_c = x.shape[-1]
        # hidden-dim rule: reference model/_base.py:36-39
        hidden = self.num_experts if in_c == 3 else int(in_c * 0.25) + 1

        # attention scores: GAP → 1x1 → ReLU → 1x1(+bias) → softmax(·/T)
        pooled = jnp.mean(x, axis=(1, 2))  # (B, C)
        a = nn.Dense(hidden, use_bias=False, name="attn_fc1",
                     dtype=self.dtype)(pooled)
        a = nn.relu(a)
        a = nn.Dense(self.num_experts, use_bias=True, name="attn_fc2",
                     dtype=self.dtype)(a)
        # softmax at ≥f32 for stability under bf16 compute (f32/f64 inputs
        # keep their precision — demoting f64 here would put an f32
        # bottleneck in the middle of the f64 parity programs, whose
        # compile-dependent reassociation shows up as f32-eps gradient
        # divergence between otherwise-identical schedules)
        attn = jax.nn.softmax(
            a.astype(jnp.promote_types(a.dtype, jnp.float32)) / attn_temp,
            axis=-1)  # (B, E)

        # expert kernels stacked on the output-channel axis
        k = self.kernel_size
        experts = self.param(
            "experts",
            nn.initializers.variance_scaling(2.0, "fan_in",
                                             "truncated_normal"),
            (k, k, in_c, self.num_experts * self.out_channels))

        div = ((self.stride == 2 and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0)
               or (self.stride == 1 and x.shape[1] % 4 == 0
                   and x.shape[2] % 4 == 0))
        if k == 1 and self.stride == 1 and self.padding == 0:
            # 1x1 dynamic conv: the per-sample mixed kernel is just an
            # (in_c, out_c) matrix — mix FIRST (tiny einsum), then one
            # batched matmul. 4x fewer FLOPs than the stacked-expert conv
            # + contraction and no E-wide intermediate (measured ~2.5x
            # faster at the FPN's 768->256 @40 placement).
            e3 = experts.reshape(in_c, self.num_experts, self.out_channels)
            kb = jnp.einsum("ieo,be->bio", e3, attn.astype(x.dtype))
            y = jnp.einsum("bhwi,bio->bhwo", x, kb)
        elif use_fast_conv3x3(in_c, k, self.stride) and self.padding == 1 \
                and div:
            # mix per-sample kernels first (tiny einsum), then one
            # patchified batched matmul — avoids the E× intermediate that
            # dominates at large spatial sizes
            e5 = experts.reshape(k, k, in_c, self.num_experts,
                                 self.out_channels)
            kb = jnp.einsum("hwieo,be->bhwio", e5,
                            attn.astype(e5.dtype))  # (B,k,k,I,O)
            y = fast_conv3x3(x, kb.astype(x.dtype), self.stride)
        else:
            # ONE conv with all experts stacked, then contract the expert
            # axis as a batched matmul against attn ⊗ I — a reshape-free
            # formulation that spares XLA the layout copies the
            # reshape+reduce version forces (measured 1.6× faster at 640px)
            y = jax.lax.conv_general_dilated(
                x, experts.astype(x.dtype),
                window_strides=(self.stride, self.stride),
                padding=_pad(self.padding),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            b = y.shape[0]
            eye = jnp.eye(self.out_channels, dtype=y.dtype)
            mix = jnp.einsum("be,oq->beoq", attn.astype(y.dtype),
                             eye).reshape(
                b, self.num_experts * self.out_channels, self.out_channels)
            y = jnp.einsum("bhwc,bco->bhwo", y, mix)

        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        return nn.silu(y)


class ObjectnessHead(nn.Module):
    """1x1 conv → (B, A, H, W, 1) objectness logits (reference :80-99)."""

    n_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.n_anchors, (1, 1), use_bias=True,
                    dtype=self.dtype)(x)
        b, h, w, _ = x.shape
        return x.reshape(b, h, w, self.n_anchors, 1).transpose(0, 3, 1, 2, 4)


class BBoxHead(nn.Module):
    """1x1 conv → (B, A, H, W, 4) box logits (reference :102-120)."""

    n_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.n_anchors * 4, (1, 1), use_bias=True,
                    dtype=self.dtype)(x)
        b, h, w, _ = x.shape
        return x.reshape(b, h, w, self.n_anchors, 4).transpose(0, 3, 1, 2, 4)


class YOLOHead(nn.Module):
    """Multi-scale detection head: per-scale {obj, bbox} pairs
    (reference model/_base.py:122-153). Loss lives in ops/losses.py."""

    n_anchors: int
    n_scales: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f_maps: Sequence[jnp.ndarray]) -> List[DetectionResults]:
        assert len(f_maps) == self.n_scales
        outs = []
        for i, f in enumerate(f_maps):
            obj = ObjectnessHead(self.n_anchors, name=f"obj_{i}",
                                 dtype=self.dtype)(f)
            bbox = BBoxHead(self.n_anchors, name=f"bbox_{i}",
                            dtype=self.dtype)(f)
            outs.append(DetectionResults(bbox=bbox, obj=obj))
        return outs


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample, NHWC (reference nn.Upsample(2))."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
