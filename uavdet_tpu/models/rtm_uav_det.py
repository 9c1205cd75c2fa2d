"""RTMUAVDet — deprecated real-time detector (kept for zoo parity).

Parity target: reference model/RTMUAVDet.py (marked
``@deprecated("INVALID MODEL CONFIGURATION")`` at :313 and import-broken —
``filter_high_iou_bboxes`` never existed in utils/metrics.py, :11). Like the
reference it is NOT exported from models/__init__ nor dispatchable via
``build_model``; unlike the reference, importing and running it works, and
the missing loss helper is reconstructed (documented below).

Blocks:
* ``RTMConvModule``  Conv→BN(eps=1e-3, momentum=0.03)→SiLU (reference :15-25)
* ``StemLayer``      5x5/s2 conv (reference :28-36)
* ``MDyConv``        1x1 base conv → GAP attention → per-channel scale
                     (channel_fc) ⊗ full k×k spatial kernel (kernel_fc) →
                     per-sample per-channel DEPTHWISE dynamic conv + residual
                     (reference :40-100). The reference applies it with a
                     ``groups=batch*channels`` cuDNN conv; here we use the
                     factorization kernel[b,c] = channel_w[b,c]·kernel_w[b]:
                     convolve every channel with the (per-sample) spatial
                     kernel once, then scale channels — one vmapped
                     single-filter conv instead of B·C grouped convs.
* ``MDyCSPModule``   CSP split with an MDyConv compute path (reference
                     :103-140)
* ``MDyEncoder``     GroupNorm → parallel 1x1/3x3/5x5 MDyConvs → channel-MLP
                     with GELU+Dropout (reference :144-184; the commented-out
                     second residual add is likewise omitted)
* ``MFDFEncoderModule`` bilinear-upsample cross-scale fusion (reference
                     :186-215)
* ``RTMHead``        sigmoid heads + grid/anchor decode (reference :258-310)
"""

import os
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.boxes import box_convert, box_iou_pairwise
from ..ops.resize import bilinear_resize
from ..utils.datatypes import DetectionResults


class RTMConvModule(nn.Module):
    """Conv → BN(eps=1e-3, torch-momentum 0.03 ⇒ flax 0.97) → SiLU/ReLU."""

    out_channels: int
    kernel_size: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    padding: Any = 0
    eps: float = 1e-3
    momentum: float = 0.97
    activation: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        else:
            pad = tuple((p, p) for p in pad)
        x = nn.Conv(self.out_channels, self.kernel_size,
                    strides=self.stride, padding=pad, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.momentum, epsilon=self.eps,
                         dtype=self.dtype)(x)
        return nn.silu(x) if self.activation == "silu" else nn.relu(x)


class StemLayer(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return RTMConvModule(self.out_channels, (5, 5), (2, 2),
                             padding=(1, 1), dtype=self.dtype)(x, train)


def _spatial_dyconv(x, kernel_w, padding, impl):
    """Per-sample spatial filter shared across channels: every channel of
    ``x[b]`` is convolved with the SAME k×k kernel ``kernel_w[b]``. Three
    mathematically identical formulations (all accumulate in f32, like
    XLA's conv), selectable for TPU performance:

    * ``vmap`` (default): channels-as-batch single-filter conv. On paper
      its (C, H, W, 1) operand pads the minor dim 1→128, but measured
      end-to-end on v5e it is the FASTEST by a wide margin — XLA's conv
      lowering handles the relayout better than either rewrite
      (cfg4 675.9 fps vs 552.3 ``dw`` / 501.6 ``shift``; PERF.md
      round-3 RTM study).
    * ``dw``: vmap over batch of a depthwise conv (feature_group_count=C),
      channels stay on lanes.
    * ``shift``: k² shifted-slice multiply-adds — a pure VPU op, but the
      f32 accumulator round-trips ~9× the activation traffic through HBM.
    """
    b, h, w, c = x.shape
    k = kernel_w.shape[-1]
    p = padding
    if k == 1:
        # 1×1 spatial filter is a per-sample scalar (exact in every impl)
        return x * kernel_w[:, 0, 0][:, None, None, None]
    if impl == "shift":
        oh, ow = h + 2 * p - k + 1, w + 2 * p - k + 1
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        kw = kernel_w.astype(jnp.float32)
        acc = None
        for i in range(k):
            for j in range(k):
                term = (xp[:, i:i + oh, j:j + ow, :].astype(jnp.float32)
                        * kw[:, i, j][:, None, None, None])
                acc = term if acc is None else acc + term
        return acc.astype(x.dtype)
    if impl == "dw":
        def per_sample(xi, ki):
            kern = jnp.tile(ki[..., None, None], (1, 1, 1, c))
            return jax.lax.conv_general_dilated(
                xi[None], kern.astype(xi.dtype), (1, 1), ((p, p), (p, p)),
                feature_group_count=c,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        return jax.vmap(per_sample)(x, kernel_w)

    def spatial_conv(xi, ki):
        xi = xi.transpose(2, 0, 1)[..., None]  # (C, H, W, 1)
        out = jax.lax.conv_general_dilated(
            xi, ki[..., None, None].astype(xi.dtype), (1, 1),
            ((p, p),) * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out[..., 0].transpose(1, 2, 0)  # (H, W, C)

    return jax.vmap(spatial_conv)(x, kernel_w)


class MDyConv(nn.Module):
    attention_out_c: int
    dy_kernel_size: int = 3
    dy_padding: int = 1
    dy_channel_size: int | None = None
    dtype: Any = jnp.float32
    impl: str | None = None  # None → env UAVDET_MDYCONV or 'vmap'

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        c = self.dy_channel_size or in_c
        k = self.dy_kernel_size

        # base conv: eps=1e-5, torch-momentum 0.1 ⇒ flax 0.9 (reference :51)
        x = RTMConvModule(c, (1, 1), eps=1e-5, momentum=0.9,
                          activation="relu", dtype=self.dtype)(x, train)
        residual = x

        pooled = jnp.mean(x, axis=(1, 2))  # (B, C)
        a = nn.relu(nn.Dense(self.attention_out_c, dtype=self.dtype,
                             name="attention")(pooled))
        channel_w = nn.Dense(c, dtype=self.dtype, name="channel_fc")(a)
        kernel_w = nn.Dense(k * k, dtype=self.dtype, name="kernel_fc")(a)
        kernel_w = kernel_w.reshape(-1, k, k)  # (B, k, k)

        # per-sample spatial filter applied to every channel, then
        # per-channel scaling (kernel[b,c] = channel_w[b,c] * kernel_w[b])
        impl = self.impl or os.environ.get("UAVDET_MDYCONV", "vmap")
        y = _spatial_dyconv(x, kernel_w, self.dy_padding, impl)
        y = y * channel_w[:, None, None, :]
        return y + residual


class MDyCSPModule(nn.Module):
    out_channels: int
    reduction_ratio: int = 2
    dy_channel_size: int | None = None
    skip_base: bool = False  # input IS base_conv's output (folded front)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.skip_base:
            base_out = x.shape[-1]
        else:
            in_c = x.shape[-1]
            base_out = in_c * 2
            x = RTMConvModule(base_out, (3, 3), (2, 2), padding=(1, 1),
                              dtype=self.dtype, name="base_conv")(x, train)
        half = base_out // self.reduction_ratio
        x1 = RTMConvModule(half, (1, 1), dtype=self.dtype,
                           name="conv1")(x, train)
        x2 = RTMConvModule(half, (1, 1), dtype=self.dtype,
                           name="conv2")(x, train)
        x1 = MDyConv(16, dy_kernel_size=3,
                     dy_channel_size=self.dy_channel_size,
                     dtype=self.dtype, name="mdy_conv")(x1, train)
        x1 = RTMConvModule(half, (1, 1), dtype=self.dtype,
                           name="transition1")(x1, train)
        x = jnp.concatenate([x1, x2], axis=-1)
        return RTMConvModule(self.out_channels, (3, 3), padding=(1, 1),
                             dtype=self.dtype, name="transition2")(x, train)


class MDyEncoder(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        residual = x
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                         dtype=self.dtype, name="group_norm_in")(x)
        third = in_c // 3
        x1 = MDyConv(16, 1, 0, third, dtype=self.dtype,
                     name="mdy_conv_1x1")(x, train)
        x2 = MDyConv(16, 3, 1, third, dtype=self.dtype,
                     name="mdy_conv_3x3")(x, train)
        x3 = MDyConv(16, 5, 2, third, dtype=self.dtype,
                     name="mdy_conv_5x5")(x, train)
        x = jnp.concatenate([x1, x2, x3], axis=-1)
        x = x + residual
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                         dtype=self.dtype, name="group_norm_out")(x)
        x = nn.Conv(in_c, (1, 1), dtype=self.dtype, name="mlp_fc1")(x)
        x = nn.gelu(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="mlp_fc2")(x)


class MFDFEncoderModule(nn.Module):
    x1_c_in: int
    x2_c_in: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        b, h, w, c = x2.shape
        # bilinear 2x upsample as separable matmuls — same numerics as
        # jax.image.resize('bilinear'), which lowers to slow TPU gathers
        # (ops/resize.py; PERF.md r3)
        up = bilinear_resize(x2, h * 2, w * 2)
        f = nn.Conv(self.x2_c_in // 4, (3, 3), padding=1,
                    dtype=self.dtype, name="upsample_conv")(up)
        x1 = jnp.concatenate([x1, f], axis=-1)
        x1 = MDyEncoder(self.x1_c_in, dtype=self.dtype,
                        name="encoder_x1")(x1, train)
        down = nn.Conv(self.x1_c_in, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="downsample")(x1)
        x2 = jnp.concatenate([x2, down], axis=-1)
        x2 = MDyEncoder(self.x2_c_in, dtype=self.dtype,
                        name="encoder_x2")(x2, train)
        return x1, x2


class RTMHead(nn.Module):
    """Sigmoid obj/bbox heads + grid/anchor decode (reference :258-310)."""

    anchors: Tuple[Tuple[Tuple[float, float], ...], ...]
    det_scales: Tuple[int, ...] = (160, 80)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2) -> List[DetectionResults]:
        outs = []
        for head_idx, f in enumerate((x1, x2)):
            anchors = jnp.asarray(self.anchors[head_idx], jnp.float32)
            n_anchors = anchors.shape[0]
            b, h, w, _ = f.shape

            obj = nn.Conv(n_anchors, (1, 1), dtype=self.dtype,
                          name=f"obj_{head_idx}")(f)
            obj = jax.nn.sigmoid(obj.astype(jnp.float32))
            obj = obj.reshape(b, h, w, n_anchors, 1).transpose(0, 3, 1, 2, 4)

            bbox = nn.Conv(n_anchors * 4, (1, 1), dtype=self.dtype,
                           name=f"bbox_{head_idx}")(f)
            bbox = jax.nn.sigmoid(bbox.astype(jnp.float32))
            bbox = bbox.reshape(b, h, w, n_anchors, 4).transpose(
                0, 3, 1, 2, 4)

            gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
            gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
            px = bbox[..., 0] * 2 - 0.5 + gx
            py = bbox[..., 1] * 2 - 0.5 + gy
            pw = (bbox[..., 2] * 2) ** 2 * anchors[:, 0][:, None, None]
            ph = (bbox[..., 3] * 2) ** 2 * anchors[:, 1][:, None, None]
            outs.append(DetectionResults(
                bbox=jnp.stack([px, py, pw, ph], axis=-1), obj=obj))
        return outs


class RTMUAVDet(nn.Module):
    """Full model (reference :313-345). DEPRECATED — invalid model
    configuration upstream; kept runnable for completeness."""

    anchors: Tuple[Tuple[Tuple[float, float], ...], ...]
    input_channels: int = 3
    det_scales: Tuple[int, ...] = (160, 80)
    stem_folded: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype or jnp.float32
        x = x.astype(dt)
        if self.stem_folded:
            # inference fast path: x is MDyCSP_1.base_conv's output,
            # produced by ops.fold_rtm.fold_rtm_front — the 4x-lane-
            # padded 32-ch @H/2 stem map never materializes. Same
            # variable tree (stem/base_conv params simply not visited).
            x1 = MDyCSPModule(128, dy_channel_size=128, skip_base=True,
                              dtype=dt, name="MDyCSP_1")(x, train)
        else:
            x1 = StemLayer(32, dtype=dt, name="stem")(x, train)
            x1 = MDyCSPModule(128, dy_channel_size=128, dtype=dt,
                              name="MDyCSP_1")(x1, train)
        x2 = MDyCSPModule(256, dtype=dt, name="MDyCSP_2")(x1, train)
        x1, x2 = MFDFEncoderModule(128, 256, dtype=dt,
                                   name="neck")(x1, x2, train)
        return RTMHead(self.anchors, self.det_scales, dtype=dt,
                       name="head")(x1, x2)


def filter_high_iou_bboxes(p_bbox: jnp.ndarray, p_obj: jnp.ndarray,
                           t_bbox: jnp.ndarray, iou_threshold: float = 0.5):
    """RECONSTRUCTION of the reference's missing loss helper.

    ``utils.metrics.filter_high_iou_bboxes`` is imported at
    reference RTMUAVDet.py:11 and used at :376 but was never committed
    upstream (the import error is why the model is dead code there). From
    the call site semantics we reconstruct:

      * ``filtered_p_bbox`` — for each target, the highest-IoU prediction
        (aligned with ``t_bbox`` for the bbox loss),
      * ``filtered_p_obj``  — the scores of those predictions,
      * ``t_obj``           — per-prediction objectness target: 1 where the
        prediction overlaps any target with IoU > threshold.

    p_bbox: (N, 4) xyxy; p_obj: (N,); t_bbox: (M, 4) xyxy.
    """
    iou = box_iou_pairwise(p_bbox, t_bbox)  # (N, M)
    best_pred = jnp.argmax(iou, axis=0)     # (M,)
    filtered_p_bbox = p_bbox[best_pred]
    filtered_p_obj = p_obj[best_pred]
    t_obj = (jnp.max(iou, axis=1) > iou_threshold).astype(p_obj.dtype)
    return filtered_p_bbox, filtered_p_obj, t_obj


def rtm_compute_loss(outs: Sequence[DetectionResults],
                     target_boxes: jnp.ndarray, input_size: int,
                     det_scales: Sequence[int] = (160, 80)):
    """Reference RTMUAVDet.compute_metrics loss semantics (:357-385) with
    the reconstructed helper: per-sample per-head mse bbox loss on the
    best-matched preds + BCE-on-probabilities objectness."""
    batch = outs[0].bbox.shape[0]
    total = jnp.zeros((), jnp.float32)
    for det_idx, out in enumerate(outs):
        scale_factor = input_size // det_scales[det_idx]
        for i in range(batch):
            p_bbox = out.bbox[i].reshape(-1, 4)
            p_obj = out.obj[i].reshape(-1)
            p_xyxy = box_convert(p_bbox, "cxcywh", "xyxy")
            t = target_boxes[i] / scale_factor  # xyxy grid space
            fb, fo, t_obj = filter_high_iou_bboxes(p_xyxy, p_obj, t)
            bbox_l = jnp.mean((fb - t) ** 2)
            eps = 1e-7
            obj_l = -jnp.mean(t_obj * jnp.log(p_obj + eps)
                              + (1 - t_obj) * jnp.log(1 - p_obj + eps))
            total = total + bbox_l + obj_l
    return total / batch
