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


class _ExpertsConv(nn.Module):
    """Param-tree-compatible stand-in for the SOEM experts
    ``nn.Conv(features, (ks, ks), padding=ks//2, use_bias=True)`` —
    same params (``kernel``/``bias``), shapes, and initializers — that
    can apply the conv EITHER on the space-to-depth'd map (plain path)
    OR directly on the pre-s2d map as a (k·ks)×(k·ks) stride-k conv
    with the kernel permuted to match (fused path).

    The fusion is exact algebra: s2d is a pixel→channel permutation, so
    a ks×ks conv on the s2d'd map taps original pixels
    (k·dy + pi − k·(ks//2), k·dx + pj − …) for s2d channel phase
    (pi, pj) — i.e. a dense (k·ks)² stride-k window. Rearranging the
    (ks, ks, k²·C, F) kernel to (k·ks, k·ks, C, F) by
    [k·dy+pi, k·dx+pj, c] ← [dy, dx, (pi·k+pj)·C + c] reproduces every
    tap. Why: space_to_depth is a relayout XLA executes at transpose
    speed (~60-100 GB/s) — at DySOEM bs=32 @1280 the two inner s2d's
    move ~2.5 GB/step; the fused form never materializes them.
    """

    features: int
    ksize: int
    kk_cin: int  # k²·C_in, the s2d'd channel count
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, k: int, fused: bool):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.ksize, self.ksize, self.kk_cin,
                             self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        dt = x.dtype
        ks = self.ksize
        if not fused:
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(dt), window_strides=(1, 1),
                padding=_same_pad(ks // 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(dt)
        c_in = x.shape[-1]
        ker = kernel.reshape(ks, ks, k, k, c_in, self.features)
        ker = ker.transpose(0, 2, 1, 3, 4, 5).reshape(
            k * ks, k * ks, c_in, self.features)
        pad = k * (ks // 2)
        y = jax.lax.conv_general_dilated(
            x, ker.astype(dt), window_strides=(k, k),
            padding=_same_pad(pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(dt)


def _same_pad(p: int):
    return ((p, p), (p, p))


class DynamicSOEM(nn.Module):
    """Small-Object Enhancement Module (reference DySOEM_SimFPN.py:38-94).

    ``skip_s2d``: the input is ALREADY the space-to-depth'd feature map
    (used by the folded-stem inference path, see ``fold_input_stem``).
    Control-flow only — the variable tree is identical either way.

    ``s2d_conv``: apply the experts conv directly on the pre-s2d map as
    a (k·ks)×(k·ks) stride-k conv (exact kernel permutation, see
    ``_ExpertsConv``) instead of materializing space_to_depth. The
    attention GAP is computed as per-(phase, channel) means via a
    reduce (no relayout). Same variable tree; numerics equal to the
    plain path within f32-accumulation reassociation (~1 ulp, tested).
    """

    in_channels: int
    num_dy_conv: int = 3
    dy_kernel_size: int = 3
    downsample_factor: int = 2
    reduction_ratio: int = 2
    skip_s2d: bool = False
    s2d_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_temp: float = 1.0, train: bool = False):
        k = self.downsample_factor
        b, h, w, c = x.shape
        fused = (self.s2d_conv and not self.skip_s2d
                 and h % k == 0 and w % k == 0)
        dt = self.dtype or jnp.float32

        if self.skip_s2d:
            f = x
        elif fused:
            f = None  # the s2d'd map never exists
        else:
            f = space_to_depth(x, k)
        in_attn = (k * k * c) if fused else f.shape[-1]
        out_c = in_attn // self.reduction_ratio
        hidden = max(1, in_attn // 4)

        if fused:
            # per-(row phase, col phase, channel) means == GAP over the
            # s2d'd map in its channel order (pi·k + pj)·C + c
            pooled = x.astype(dt).reshape(
                b, h // k, k, w // k, k, c).mean(axis=(1, 3))
            pooled = pooled.reshape(b, k * k * c)
        else:
            pooled = jnp.mean(f.astype(dt), axis=(1, 2))
        a = nn.Dense(hidden, name="attn_fc1", dtype=self.dtype)(pooled)
        a = nn.relu(a)
        a = nn.Dense(self.num_dy_conv, name="attn_fc2", dtype=self.dtype)(a)
        # ≥f32 softmax: stability under bf16, full precision at f32/f64
        # (see DyConvModule — an f32 bottleneck breaks f64 parity programs)
        attn = jax.nn.softmax(
            a.astype(jnp.promote_types(a.dtype, jnp.float32)) / attn_temp,
            axis=-1)  # (B, E)

        ks = self.dy_kernel_size
        y = _ExpertsConv(self.num_dy_conv * out_c, ks, in_attn,
                         dtype=self.dtype, name="experts")(
            (x if fused else f).astype(dt), k, fused)
        # contract the expert axis via the 5D split + einsum. The r4
        # attn ⊗ I batched-matmul rewrite (DyConvModule's reshape-free
        # form) was A/B'd end-to-end in r5 and REVERTED: it carries
        # out_c× the contraction FLOPs, and at the SOEM's channel widths
        # that loses — cfg3 measured 89.1 (kron) vs 96.4 (this form)
        # fps on v5e. The relayout the kron form avoids is evidently
        # absorbed by XLA here (unlike DyConvModule's L1/L2 shapes,
        # where the kron form measured faster — both are measurements,
        # not theory; see PERF.md round-5).
        b, hh, ww, _ = y.shape
        y = y.reshape(b, hh, ww, self.num_dy_conv, out_c)
        y = jnp.einsum("bhwec,be->bhwc", y, attn.astype(y.dtype))

        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        return nn.silu(y)


def fold_input_stem(variables, k: int = 2, dtype: Any = jnp.float32):
    """Build the algebraically-folded stem front: raw frames → the
    post-s2d feature map soem_0 consumes, WITHOUT ever materializing the
    full-resolution stem activation.

    s2d is a pure pixel→channel permutation and the stem is per-pixel
    (1×1 conv + BN + SiLU, all channelwise), so they commute:

        s2d(act(BN(W₁·x))) == act(BN_tiled(W_blk · s2d(x)))

    where ``W_blk`` is (k²·C_in, k²·C_out) block-diagonal with W₁ in each
    phase block and the BN parameters are phase-tiled. The zero blocks
    contribute exactly 0 to every dot product, so the fold is
    numerically exact. The payoff at DySOEM bs=32 @1280 (VERDICT r2
    weak #2): the 32-channel stem output forces a 4×-lane-padded
    12.5 GB layout (misses HBM by 47 MB); the folded conv reads the
    12-channel s2d'd input and writes the 128-channel (lane-exact) map
    at 640² — the padded giant never exists.

    EVAL-ONLY: in train mode BN statistics would be computed per
    (phase, channel) instead of pooled over phases — not equivalent.
    Reference op being replaced: model/DySOEM_SimFPN.py:27-33 + :71-75.

    → ``front(x) -> f`` with x (B, H, W, C) float, f (B, H/k, W/k,
    k²·C_out) in ``dtype``.
    """
    cm = variables["params"]["input_stem"]["ConvModule_0"]
    bn_s = variables["batch_stats"]["input_stem"]["ConvModule_0"][
        "BatchNorm_0"]
    w1 = jnp.asarray(cm["Conv_0"]["kernel"], jnp.float32)  # (1,1,Cin,Cout)
    c_in, c_out = w1.shape[2], w1.shape[3]
    scale = jnp.asarray(cm["BatchNorm_0"]["scale"], jnp.float32)
    bias = jnp.asarray(cm["BatchNorm_0"]["bias"], jnp.float32)
    mean = jnp.asarray(bn_s["mean"], jnp.float32)
    var = jnp.asarray(bn_s["var"], jnp.float32)

    kk = k * k
    w_blk = jnp.zeros((1, 1, kk * c_in, kk * c_out), jnp.float32)
    for p in range(kk):
        w_blk = w_blk.at[0, 0, p * c_in:(p + 1) * c_in,
                         p * c_out:(p + 1) * c_out].set(w1[0, 0])
    w_blk = w_blk.astype(dtype)
    # phase-tiled BN epilogue, flax BatchNorm's exact formula/order:
    # (x - mean) * (scale * rsqrt(var + eps)) + bias computed in f32
    # with f32 constants, ONE cast to dtype at the end — flax promotes
    # the bf16 conv output to f32 for the whole normalization (verified
    # bitwise; pre-rounding the constants to bf16 diverges)
    mul = jnp.tile(scale, kk) * jax.lax.rsqrt(jnp.tile(var, kk) + 1e-5)
    mean_t = jnp.tile(mean, kk)
    bias_t = jnp.tile(bias, kk)

    def front(x):
        # raw uint8 frames carry the /255 preprocess fold (the detector
        # skips `preprocess` when a stem fast path accepts native frames)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        xs = space_to_depth(x.astype(dtype), k)
        y = jax.lax.conv_general_dilated(
            xs, w_blk, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = ((y.astype(jnp.float32) - mean_t) * mul
             + bias_t).astype(dtype)
        return nn.silu(y)

    return front


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
        # conv BEFORE upsample: a 1x1 conv is per-pixel, so it commutes
        # with nearest upsample BITWISE — conving at the low resolution
        # reads 4x fewer bytes (and 4x fewer MACs). Same variable tree.
        # A/B'd end-to-end in r5: 93.6 (conv after up2) → 96.4 fps
        # (this form) on cfg3, with the contraction held fixed.
        center = x1 + up2(nn.Conv(c1, (1, 1), name="x2_in_down",
                                  dtype=dt)(x2)) + x1
        x0 = x0 + up2(nn.Conv(c0, (1, 1), name="center_down",
                              dtype=dt)(center))
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

    ``stem_folded``: inference fast path — the input is the POST-s2d
    feature map produced by ``fold_input_stem`` (B, H/2, W/2, k²·stem_out)
    and input_stem + soem_0's s2d are skipped. Same variable tree (the
    unused input_stem params are simply not visited). Why: at bs=32
    @1280px the 32-channel stem activation picks a 4×-lane-padded
    12.5 GB layout that misses HBM; the folded front emits the 128-channel
    map (zero padding) at 640² directly.
    """

    stem_out_channels: int = 32
    num_dy_conv: Tuple[int, ...] = (3, 3, 3)
    dy_kernel_size: Tuple[int, ...] = (3, 3, 3)
    attn_temperature: float = 30.0
    n_anchors: int = 3
    stem_folded: bool = False
    s2d_conv: bool = True  # fused s2d-as-conv SOEMs (see DynamicSOEM)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(self.num_dy_conv) == len(self.dy_kernel_size)
        dt = self.dtype or jnp.float32
        if not self.stem_folded:
            x = InputStemLayer(self.stem_out_channels, name="input_stem",
                               dtype=dt)(x.astype(dt), train)

        feats = []
        for i, (e, ks) in enumerate(
                zip(self.num_dy_conv, self.dy_kernel_size)):
            x = DynamicSOEM(x.shape[-1], num_dy_conv=e, dy_kernel_size=ks,
                            skip_s2d=self.stem_folded and i == 0,
                            s2d_conv=self.s2d_conv,
                            name=f"soem_{i}", dtype=dt)(
                x, self.attn_temperature, train)
            feats.append(x)

        x0, x1, x2 = SimplifiedFPN(name="neck", dtype=dt)(feats, train)
        return YOLOHead(self.n_anchors, 3, dtype=dt,
                        name="yolo_head")([x0, x1, x2])
