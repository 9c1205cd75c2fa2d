"""Model zoo shape/NaN tests + the dynamic-conv equivalence proof.

The DyConv equivalence test is the load-bearing one: it checks that our
stacked-expert-conv + attention-contraction formulation equals the
reference's mix-kernels-then-convolve form (model/_base.py:64-74) to float
tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uavdet_tpu.models import (
    BaselineModel, DyConvModule, DyYOLO, DySOEM_SimFPN, build_model)
from uavdet_tpu.models.dysoem_simfpn import space_to_depth
from uavdet_tpu.models.interpreter import head_channels

# a tiny Darknet-ish config exercising every token type
TINY_CONFIG = (
    (8, 3, 1),
    (16, 3, 2),
    ("B", 1),
    (32, 3, 2),
    ("B", 8),          # route push
    (64, 3, 2),
    ("B", 8),          # route push
    (128, 3, 2),
    ("B", 1),
    (64, 1, 1),
    (128, 3, 1),
    ("S",),
    (32, 1, 1),
    ("U",),
    (32, 1, 1),
    (64, 3, 1),
    ("S",),
    (16, 1, 1),
    ("U",),
    (16, 1, 1),
    (32, 3, 1),
    ("S",),
)

TINY_DY_CONFIG = (("DyConv", 8, 3, 1),) + TINY_CONFIG[1:]


def test_head_channels_static_pass():
    assert head_channels(TINY_CONFIG) == [128, 64, 32]


@pytest.mark.parametrize("cls,cfg", [
    (BaselineModel, TINY_CONFIG), (DyYOLO, TINY_DY_CONFIG)])
def test_interpreter_models_shapes(cls, cfg):
    m = cls(layer_config=cfg)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = m.init(jax.random.key(0), x)
    outs = m.apply(vars_, x)
    assert len(outs) == 3
    # strides 16, 8, 4 for the tiny config (64px input)
    sizes = [o.obj.shape for o in outs]
    assert sizes[0] == (2, 3, 4, 4, 1)
    assert sizes[1] == (2, 3, 8, 8, 1)
    assert sizes[2] == (2, 3, 16, 16, 1)
    assert outs[0].bbox.shape == (2, 3, 4, 4, 4)
    for o in outs:
        assert np.isfinite(np.asarray(o.bbox)).all()
        assert np.isfinite(np.asarray(o.obj)).all()


def test_dyconv_equals_mix_then_conv(rng):
    """conv(x, Σ a_e W_e) == Σ a_e conv(x, W_e) — our stacked-expert form
    must match the reference's per-sample kernel aggregation."""
    B, H, W, Cin, Cout, E, K = 3, 16, 16, 8, 12, 4, 3
    m = DyConvModule(out_channels=Cout, kernel_size=K, stride=1, padding=1,
                     num_experts=E)
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32))
    vars_ = m.init(jax.random.key(1), x, 30.0)

    got = m.apply(vars_, x, 30.0)

    # independent "mix kernels then convolve per sample" computation
    p = vars_["params"]
    pooled = np.asarray(x).mean(axis=(1, 2))
    a = pooled @ np.asarray(p["attn_fc1"]["kernel"])
    a = np.maximum(a, 0)
    a = a @ np.asarray(p["attn_fc2"]["kernel"]) + np.asarray(
        p["attn_fc2"]["bias"])
    attn = jax.nn.softmax(jnp.asarray(a) / 30.0, axis=-1)  # (B, E)

    experts = np.asarray(p["experts"]).reshape(K, K, Cin, E, Cout)
    outs = []
    for b in range(B):
        mixed = np.einsum("hwieo,e->hwio", experts, np.asarray(attn[b]))
        y = jax.lax.conv_general_dilated(
            x[b:b + 1], jnp.asarray(mixed), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        outs.append(np.asarray(y[0]))
    mixed_out = np.stack(outs)

    # compare pre-BN: re-run the stacked conv by hand
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["experts"]), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(B, H, W, E, Cout)
    stacked_out = np.asarray(jnp.einsum("bhwec,be->bhwc", y, attn))

    np.testing.assert_allclose(stacked_out, mixed_out, rtol=2e-4, atol=2e-5)
    assert np.isfinite(np.asarray(got)).all()


def test_dyconv_1x1_mix_first_equals_stacked(rng):
    """The 1x1 DyConv mix-first batched-matmul path must equal the
    stacked-expert conv + attention contraction (both reference-exact by
    linearity)."""
    B, H, W, Cin, Cout, E = 3, 16, 16, 24, 12, 4
    m = DyConvModule(out_channels=Cout, kernel_size=1, stride=1, padding=0,
                     num_experts=E)
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32))
    vars_ = m.init(jax.random.key(1), x, 30.0)
    got = m.apply(vars_, x, 30.0)

    p = vars_["params"]
    pooled = np.asarray(x).mean(axis=(1, 2))
    a = np.maximum(pooled @ np.asarray(p["attn_fc1"]["kernel"]), 0)
    a = a @ np.asarray(p["attn_fc2"]["kernel"]) + np.asarray(
        p["attn_fc2"]["bias"])
    attn = np.asarray(jax.nn.softmax(jnp.asarray(a) / 30.0, axis=-1))

    # oracle: stacked conv then contraction (the generic path)
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["experts"]), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = np.asarray(y).reshape(B, H, W, E, Cout)
    pre_bn = np.einsum("bhweo,be->bhwo", y, attn)

    # apply BN+SiLU the same way the module does (inference stats)
    s = vars_["batch_stats"]["BatchNorm_0"]
    bnp = p["BatchNorm_0"]
    norm = (pre_bn - np.asarray(s["mean"])) / np.sqrt(
        np.asarray(s["var"]) + 1e-5)
    want = norm * np.asarray(bnp["scale"]) + np.asarray(bnp["bias"])
    want = want * (1 / (1 + np.exp(-want)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_space_to_depth_matches_strided_slicing(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    y = space_to_depth(x, 2)
    assert y.shape == (2, 4, 4, 12)
    # phase ordering (i, j) = (n//2, n%2), channels stacked in that order
    np.testing.assert_array_equal(np.asarray(y[..., 0:3]),
                                  np.asarray(x[:, 0::2, 0::2, :]))
    np.testing.assert_array_equal(np.asarray(y[..., 3:6]),
                                  np.asarray(x[:, 0::2, 1::2, :]))
    np.testing.assert_array_equal(np.asarray(y[..., 6:9]),
                                  np.asarray(x[:, 1::2, 0::2, :]))
    np.testing.assert_array_equal(np.asarray(y[..., 9:12]),
                                  np.asarray(x[:, 1::2, 1::2, :]))


def test_dysoem_simfpn_shapes():
    m = DySOEM_SimFPN()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.key(0), x)
    outs = m.apply(vars_, x)
    assert len(outs) == 3
    # strides 2, 4, 8
    assert outs[0].obj.shape == (1, 3, 32, 32, 1)
    assert outs[1].obj.shape == (1, 3, 16, 16, 1)
    assert outs[2].obj.shape == (1, 3, 8, 8, 1)


def test_registry_dispatch():
    class H:
        anchors = [[[199, 73], [315, 92], [268, 182]]] * 3
        head_scales = [32, 16, 8]
        attn_temperature = 30.0
        layer_config = [list(t) for t in TINY_DY_CONFIG]

    m = build_model("DyYOLO", H)
    assert isinstance(m, DyYOLO)
    with pytest.raises(ValueError):
        build_model("RTMUAVDet", H)  # not dispatchable, like the reference


def test_folded_stem_matches_unfolded(rng):
    """fold_input_stem (cfg3's HBM fix): the block-diagonal folded front
    + stem_folded tail must reproduce the plain model bit-closely in
    eval mode (the fold only adds exact-zero terms to each dot product).
    Reference ops being composed: model/DySOEM_SimFPN.py:27-33 + :71-75."""
    import jax
    from uavdet_tpu.models.dysoem_simfpn import fold_input_stem

    m = DySOEM_SimFPN()
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    variables = m.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)),
                       train=False)
    # randomize running stats so the BN epilogue actually matters
    variables = jax.tree.map(
        lambda v: v + 0.05 * rng.standard_normal(v.shape).astype(v.dtype)
        if v.ndim == 1 else v, variables)

    want = m.apply(variables, jnp.asarray(x), train=False)

    front = fold_input_stem(variables)
    tail = m.clone(stem_folded=True)
    got = tail.apply(variables, front(jnp.asarray(x)), train=False)

    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g.bbox), np.asarray(w.bbox),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g.obj), np.asarray(w.obj),
                                   rtol=1e-5, atol=1e-5)

    # uint8 entry folds /255 identically to preprocess()
    xu = (x * 255).astype(np.uint8)
    got_u = tail.apply(variables, front(jnp.asarray(xu)), train=False)
    want_u = m.apply(variables,
                     jnp.asarray(xu.astype(np.float32) / 255.0),
                     train=False)
    np.testing.assert_allclose(np.asarray(got_u[0].bbox),
                               np.asarray(want_u[0].bbox),
                               rtol=1e-5, atol=1e-5)


def test_soem_s2d_conv_matches_plain(rng):
    """DynamicSOEM's fused s2d-as-conv path (the experts conv applied
    directly to the pre-s2d map as a (k·ks)² stride-k conv with a
    permuted kernel — eliminates the space_to_depth relayout, PERF.md
    r3) must (a) produce the SAME variable tree as the plain path
    bitwise, (b) reproduce the plain path's outputs to f32-reassociation
    tolerance, in both eval and train mode."""
    import jax
    from uavdet_tpu.models.dysoem_simfpn import DySOEM_SimFPN

    m_fused = DySOEM_SimFPN()                 # s2d_conv=True default
    m_plain = DySOEM_SimFPN(s2d_conv=False)   # the s2d formulation
    z = jnp.zeros((1, 64, 64, 3))
    v_f = m_fused.init(jax.random.key(5), z, train=False)
    v_p = m_plain.init(jax.random.key(5), z, train=False)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), v_f, v_p)

    variables = jax.tree.map(
        lambda v: v + 0.05 * rng.standard_normal(v.shape).astype(v.dtype)
        if v.ndim == 1 else v, v_p)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))

    want = m_plain.apply(variables, x, train=False)
    got = m_fused.apply(variables, x, train=False)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g.bbox), np.asarray(w.bbox),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g.obj), np.asarray(w.obj),
                                   rtol=1e-4, atol=1e-5)

    # train mode: BN batch stats must match too (same conv outputs)
    wo, wm = m_plain.apply(variables, x, train=True,
                           mutable=["batch_stats"])
    go, gm = m_fused.apply(variables, x, train=True,
                           mutable=["batch_stats"])
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        wm, gm)


def test_soem_experts_conv_ckpt_compatible_with_nn_conv(rng):
    """_ExpertsConv must be a bitwise drop-in for the nn.Conv it
    replaced: same param names, shapes, AND init values under the same
    scope path (the param PRNG folds in the path; the initializers must
    match) — old checkpoints keep loading."""
    import jax
    from flax import linen as nn
    from uavdet_tpu.models.dysoem_simfpn import _ExpertsConv

    class RefWrap(nn.Module):
        @nn.compact
        def __call__(self, f):
            return nn.Conv(6, (3, 3), padding=1, use_bias=True,
                           name="experts")(f)

    class NewWrap(nn.Module):
        @nn.compact
        def __call__(self, f):
            return _ExpertsConv(6, 3, f.shape[-1], name="experts")(
                f, 2, False)

    f = jnp.asarray(rng.uniform(size=(1, 8, 8, 12)).astype(np.float32))
    v_ref = RefWrap().init(jax.random.key(7), f)
    v_new = NewWrap().init(jax.random.key(7), f)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), v_ref, v_new)
    np.testing.assert_allclose(
        np.asarray(NewWrap().apply(v_ref, f)),
        np.asarray(RefWrap().apply(v_ref, f)), rtol=1e-6, atol=1e-6)


def test_folded_stem_bf16_matches_flax_bitwise(rng):
    """Regression (r3 review): the folded front at compute_dtype=bf16 —
    the PRODUCTION cfg3 configuration — must reproduce the unfolded
    stem+s2d bitwise. flax BatchNorm promotes the bf16 conv output to
    f32 for the whole eval-mode normalization and casts once; the fold
    originally pre-rounded the BN constants to bf16 and computed the
    epilogue in bf16, diverging beyond 1 ulp."""
    import jax
    from uavdet_tpu.models.dysoem_simfpn import (
        InputStemLayer, fold_input_stem, space_to_depth)

    m = DySOEM_SimFPN()
    variables = m.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)),
                       train=False)
    variables = jax.tree.map(
        lambda v: v + 0.05 * rng.standard_normal(v.shape).astype(v.dtype)
        if v.ndim == 1 else v, variables)

    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))

    stem = InputStemLayer(dtype=jnp.bfloat16)
    sub = {"params": variables["params"]["input_stem"],
           "batch_stats": variables["batch_stats"]["input_stem"]}
    want = space_to_depth(
        stem.apply(sub, x.astype(jnp.bfloat16), train=False), 2)

    front = fold_input_stem(variables, dtype=jnp.bfloat16)
    got = front(x)

    assert got.dtype == want.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32))


def test_folded_stem_detector_end_to_end(rng):
    """make_detector auto-activates the DySOEM fold when variables are
    given; detections must match the non-folded detector exactly."""
    import jax
    from uavdet_tpu.inference import make_detector
    from tests.test_inference import HP

    m = DySOEM_SimFPN()
    variables = m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                       train=False)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8))
    kw = dict(compute_dtype=jnp.float32, pre_nms_topk=64, max_det=8,
              score_threshold=0.0)
    plain = make_detector(m, HP, 64, **kw)
    folded = make_detector(m, HP, 64, pallas_stem_variables=variables, **kw)
    a = plain(variables, imgs)
    b = folded(variables, imgs)
    np.testing.assert_allclose(np.asarray(b.boxes), np.asarray(a.boxes),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.scores), np.asarray(a.scores),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(b.valid), np.asarray(a.valid))
