"""DySOEM_SimFPN — dynamic small-object-enhancement backbone + simplified FPN.

Parity target: reference model/DySOEM_SimFPN.py (config
conf/model/dy-soem_fpn.yaml). Blocks:

* ``InputStemLayer``    3→32 1x1 ConvModule          (reference :27-33)
* ``AdaptiveStemLayer`` 1-ch IR vs 3-ch RGB stem     (reference :14-25,
                        unused by the shipped model but kept in the zoo)
* ``DynamicSOEM``       space-to-depth downsample (k=2 strided slicing,
                        reference :71-75 — a pure reshape/transpose here) →
                        per-sample scalar attention over E full convs
                        (reference :77-91) → BN+SiLU. Like DyConvModule the
                        E expert convs run as ONE stacked conv followed by an
                        attention-weighted contraction (conv is linear in the
                        kernel; biases sum the same way).
* ``SimplifiedFPN``     3-level bidirectional fusion (reference :99-126).

NOTE on the shipped reference bugs (SURVEY §2.3): the reference constructs
YOLOHead with mis-bound positional args and would raise at init; here the
head is constructed correctly. The reference's head_scales [32,16,8] also
disagree with the backbone's actual strides (2,4,8) — training code should
derive effective scales from feature shapes (see training/steps.py).
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvModule, YOLOHead


class InputStemLayer(nn.Module):
    out_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvModule(self.out_channels, (1, 1),
                          dtype=self.dtype)(x, train)


class AdaptiveStemLayer(nn.Module):
    """Separate stems for 1-channel IR and 3-channel RGB inputs."""

    out_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        name = "gray_conv" if x.shape[-1] == 1 else "rgb_conv"
        return ConvModule(self.out_channels, (1, 1), name=name,
                          dtype=self.dtype)(x, train)


def space_to_depth(x: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """Downsample by stacking the k² pixel phases on channels.

    Matches the reference's slice loop ordering (DySOEM_SimFPN.py:71-75):
    phase n → (i, j) = (n // k, n % k), channels stacked in that order —
    expressed as reshape→transpose→reshape instead of strided slices:
    XLA lowers ``x[:, i::k, j::k]`` to gathers whose temporaries blow up
    4× under TPU lane padding (measured: 4 × 3.1 GB for DySOEM bs=32
    @1280 — the difference between fitting in HBM and OOM), while the
    transpose formulation is a single relayout.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // k, k, w // k, k, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)       # (B, H/k, W/k, i, j, C)
    return x.reshape(b, h // k, w // k, k * k * c)


class DynamicSOEM(nn.Module):
    """Small-Object Enhancement Module (reference DySOEM_SimFPN.py:38-94)."""

    in_channels: int
    num_dy_conv: int = 3
    dy_kernel_size: int = 3
    downsample_factor: int = 2
    reduction_ratio: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_temp: float = 1.0, train: bool = False):
        k = self.downsample_factor
        f = space_to_depth(x, k)
        in_attn = f.shape[-1]
        out_c = in_attn // self.reduction_ratio
        hidden = max(1, in_attn // 4)

        pooled = jnp.mean(f, axis=(1, 2))
        a = nn.Dense(hidden, name="attn_fc1", dtype=self.dtype)(pooled)
        a = nn.relu(a)
        a = nn.Dense(self.num_dy_conv, name="attn_fc2", dtype=self.dtype)(a)
        attn = jax.nn.softmax(a.astype(jnp.float32) / attn_temp,
                              axis=-1)  # (B, E)

        ks = self.dy_kernel_size
        y = nn.Conv(self.num_dy_conv * out_c, (ks, ks),
                    padding=ks // 2, use_bias=True, name="experts",
                    dtype=self.dtype)(f)
        b, h, w, _ = y.shape
        y = y.reshape(b, h, w, self.num_dy_conv, out_c)
        y = jnp.einsum("bhwec,be->bhwc", y, attn.astype(y.dtype))

        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        return nn.silu(y)


class SimplifiedFPN(nn.Module):
    """3-level bidirectional fusion neck (reference DySOEM_SimFPN.py:99-126).

    x0: highest resolution, x2: lowest. The reference's center node adds x1
    twice — preserved.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f_maps: Sequence[jnp.ndarray], train: bool = False):
        x0, x1, x2 = f_maps
        c0, c1, c2 = x0.shape[-1], x1.shape[-1], x2.shape[-1]

        def up2(x):
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

        dt = self.dtype
        center = x1 + nn.Conv(c1, (1, 1), name="x2_in_down",
                              dtype=dt)(up2(x2)) + x1
        x0 = x0 + nn.Conv(c0, (1, 1), name="center_down",
                          dtype=dt)(up2(center))
        x1 = center + nn.Conv(c1, (1, 1), strides=(2, 2),
                              name="x0_out_up", dtype=dt)(x0)
        x2 = x2 + nn.Conv(c2, (1, 1), strides=(2, 2), name="x1_out_up",
                          dtype=dt)(x1)

        x0 = ConvModule(c0, (3, 3), padding=1, name="x0_conv_out",
                        dtype=dt)(x0, train)
        x1 = ConvModule(c1, (3, 3), padding=1, name="x1_conv_out",
                        dtype=dt)(x1, train)
        x2 = ConvModule(c2, (3, 3), padding=1, name="x2_conv_out",
                        dtype=dt)(x2, train)
        return x0, x1, x2


class DySOEM_SimFPN(nn.Module):
    """Full model: stem → 3×DynamicSOEM → SimplifiedFPN → YOLOHead.

    Channels: 32 → [64, 128, 256] (reference DySOEM_SimFPN.py:130-147).
    Head outputs are ordered x0 (highest-res) first, matching the config's
    anchors ordering (conf/model/dy-soem_fpn.yaml: small anchors first).
    """

    stem_out_channels: int = 32
    num_dy_conv: Tuple[int, ...] = (3, 3, 3)
    dy_kernel_size: Tuple[int, ...] = (3, 3, 3)
    attn_temperature: float = 30.0
    n_anchors: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(self.num_dy_conv) == len(self.dy_kernel_size)
        dt = self.dtype or jnp.float32
        x = InputStemLayer(self.stem_out_channels, name="input_stem",
                           dtype=dt)(x.astype(dt), train)

        feats = []
        for i, (e, ks) in enumerate(
                zip(self.num_dy_conv, self.dy_kernel_size)):
            x = DynamicSOEM(x.shape[-1], num_dy_conv=e, dy_kernel_size=ks,
                            name=f"soem_{i}", dtype=dt)(
                x, self.attn_temperature, train)
            feats.append(x)

        x0, x1, x2 = SimplifiedFPN(name="neck", dtype=dt)(feats, train)
        return YOLOHead(self.n_anchors, 3, dtype=dt,
                        name="yolo_head")([x0, x1, x2])
