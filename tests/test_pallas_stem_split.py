"""Two-kernel fused stem vs the flax DyConv stem (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from uavdet_tpu.models import DyYOLO
from uavdet_tpu.ops.pallas_stem_split import fused_stem_forward


CFG = (("DyConv", 32, 3, 1), ("DyConv", 64, 3, 2), ("B", 1), ("S",))


def test_split_stem_matches_flax(rng):
    # a tiny DyYOLO whose first two layers are the real stem shapes
    model = DyYOLO(layer_config=CFG, attn_temperature=30.0)
    x = jnp.asarray(rng.uniform(size=(2, 64, 128, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    p = variables["params"]["net"]
    s = variables["batch_stats"]["net"]

    got = fused_stem_forward(
        x, p["DyConvModule_0"], s["DyConvModule_0"],
        p["DyConvModule_1"], s["DyConvModule_1"], 30.0, interpret=True)

    # flax reference: run just the two stem layers
    from uavdet_tpu.models.layers import DyConvModule
    m0 = DyConvModule(32, 3, 1, 1)
    m1 = DyConvModule(64, 3, 2, 1)
    y = m0.apply({"params": p["DyConvModule_0"],
                  "batch_stats": s["DyConvModule_0"]}, x, 30.0, False)
    want = m1.apply({"params": p["DyConvModule_1"],
                     "batch_stats": s["DyConvModule_1"]}, y, 30.0, False)

    assert got.shape == want.shape == (2, 32, 64, 64)
    g = np.asarray(got, np.float32)
    r = np.asarray(want, np.float32)
    np.testing.assert_allclose(g, r, rtol=0.1, atol=0.03)
    assert np.corrcoef(g.ravel(), r.ravel())[0, 1] > 0.999


def test_split_stem_height_not_divisible_by_64(rng):
    """H=96 (divisible by 16, NOT by 64): pallas_l1 over-allocates
    Hp=152, so H must be threaded through to pallas_l2 explicitly —
    recovering it as Hp-24=128 produced garbage rows and a wrong output
    shape (ADVICE r1, medium)."""
    model = DyYOLO(layer_config=CFG, attn_temperature=30.0)
    x = jnp.asarray(rng.uniform(size=(2, 96, 128, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    p = variables["params"]["net"]
    s = variables["batch_stats"]["net"]

    got = fused_stem_forward(
        x, p["DyConvModule_0"], s["DyConvModule_0"],
        p["DyConvModule_1"], s["DyConvModule_1"], 30.0, interpret=True)

    from uavdet_tpu.models.layers import DyConvModule
    m0 = DyConvModule(32, 3, 1, 1)
    m1 = DyConvModule(64, 3, 2, 1)
    y = m0.apply({"params": p["DyConvModule_0"],
                  "batch_stats": s["DyConvModule_0"]}, x, 30.0, False)
    want = m1.apply({"params": p["DyConvModule_1"],
                     "batch_stats": s["DyConvModule_1"]}, y, 30.0, False)

    assert got.shape == want.shape == (2, 48, 64, 64)
    g = np.asarray(got, np.float32)
    r = np.asarray(want, np.float32)
    np.testing.assert_allclose(g, r, rtol=0.1, atol=0.03)
    assert np.corrcoef(g.ravel(), r.ravel())[0, 1] > 0.999


def test_split_stem_uint8_matches_float(rng):
    """uint8 frames straight into the fused stem (/255 folded into k1,
    byte-GAP attention) must match the float path on x/255."""
    model = DyYOLO(layer_config=CFG, attn_temperature=30.0)
    u8 = (rng.uniform(size=(2, 64, 128, 3)) * 255).astype(np.uint8)
    xf = jnp.asarray(u8.astype(np.float32) / 255.0)
    variables = model.init(jax.random.key(0), xf, train=False)
    p = variables["params"]["net"]
    s = variables["batch_stats"]["net"]
    args = (p["DyConvModule_0"], s["DyConvModule_0"],
            p["DyConvModule_1"], s["DyConvModule_1"], 30.0)

    got = fused_stem_forward(jnp.asarray(u8), *args, interpret=True)
    want = fused_stem_forward(xf, *args, interpret=True)
    g = np.asarray(got, np.float32)
    r = np.asarray(want, np.float32)
    np.testing.assert_allclose(g, r, rtol=0.05, atol=0.02)
    assert np.corrcoef(g.ravel(), r.ravel())[0, 1] > 0.999


def test_pallas_block_down_matches_flax(rng):
    """Fused ResidualBlock(64) + 3x3-s2→128 kernel (interpret) vs the flax
    modules, including the top/bottom zero-padding rows."""
    from uavdet_tpu.models.layers import CNNBlock, ResidualBlock
    from uavdet_tpu.ops.pallas_block import fold_cnnblock, pallas_block_down

    h2, w = 32, 96
    x = jnp.asarray(rng.normal(size=(2, h2, w, 64)).astype(np.float32))
    rb = ResidualBlock(64, num_repeats=1)
    rb_v = rb.init(jax.random.key(1), x, False)
    cn = CNNBlock(128, kernel_size=(3, 3), stride=(2, 2), padding=1)
    y_ref = rb.apply(rb_v, x, False)
    cn_v = cn.init(jax.random.key(2), y_ref, False)
    want = np.asarray(cn.apply(cn_v, y_ref, False))      # (2, 16, 48, 128)

    # channel-major input with 8 garbage over-rows (NaN to prove masking)
    x_cm = jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.bfloat16)
    x_cm = jnp.concatenate(
        [x_cm, jnp.full((2, 64, 8, w), jnp.nan, jnp.bfloat16)], axis=2)
    got = pallas_block_down(
        x_cm,
        fold_cnnblock(rb_v["params"]["CNNBlock_0"],
                      rb_v["batch_stats"]["CNNBlock_0"]),
        fold_cnnblock(rb_v["params"]["CNNBlock_1"],
                      rb_v["batch_stats"]["CNNBlock_1"]),
        fold_cnnblock(cn_v["params"], cn_v["batch_stats"]),
        h2=h2, interpret=True)
    g = np.asarray(jnp.transpose(got, (0, 2, 3, 1)), np.float32)
    assert g.shape == want.shape
    assert np.isfinite(g).all()
    np.testing.assert_allclose(g, want, rtol=0.1, atol=0.05)
    assert np.corrcoef(g.ravel(), want.ravel())[0, 1] > 0.999


def test_detector_pallas_block_path_matches(rng, monkeypatch):
    """Detector with the REAL DyYOLO prefix (stem + ["B",1] + [128,3,2]) —
    the pallas_block fast path engages and must match the flax path."""
    from uavdet_tpu.inference import make_detector
    from uavdet_tpu.ops import pallas_block

    monkeypatch.setenv("UAVDET_PALLAS_BLOCK", "1")  # default-off kernel
    calls = []
    orig = pallas_block.pallas_block_down
    monkeypatch.setattr(pallas_block, "pallas_block_down",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))

    cfg = (("DyConv", 32, 3, 1), ("DyConv", 64, 3, 2), ("B", 1),
           (128, 3, 2), ("B", 8), (256, 3, 2), (128, 1, 1), (256, 3, 1),
           ("S",), (64, 1, 1), ("U",), (64, 1, 1), (128, 3, 1), ("S",))
    model = DyYOLO(layer_config=cfg, attn_temperature=30.0)
    x = jnp.asarray((rng.uniform(size=(2, 64, 64, 3)) * 255).astype(
        np.uint8))
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)

    class HP:
        anchors = [[[40, 30], [60, 46], [54, 36]],
                   [[18, 14], [24, 18], [30, 12]]]
        bbox_loss_fn = "mse"

    std = make_detector(model, HP, 64, compute_dtype=jnp.float32,
                        pre_nms_topk=64, max_det=8)
    fast = make_detector(model, HP, 64, compute_dtype=jnp.float32,
                         pre_nms_topk=64, max_det=8,
                         pallas_stem_variables=variables,
                         pallas_stem_interpret=True)
    d1 = std(variables, x)
    d2 = fast(variables, x)
    assert calls, "pallas_block_down was never invoked — gate regression"
    np.testing.assert_allclose(np.asarray(d2.scores), np.asarray(d1.scores),
                               rtol=0.05, atol=0.01)
    np.testing.assert_allclose(np.asarray(d2.boxes[:, 0]),
                               np.asarray(d1.boxes[:, 0]),
                               rtol=0.1, atol=2.0)


def test_detector_falls_back_when_size_not_strip_aligned(rng):
    """input_size % 16 != 0 must silently skip the Pallas fast path."""
    from uavdet_tpu.inference import make_detector

    model = DyYOLO(layer_config=CFG, attn_temperature=30.0)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 72, 72, 3)),
                           train=False)

    class HP:
        anchors = [[[40, 30], [60, 46], [54, 36]],
                   [[18, 14], [24, 18], [30, 12]]]
        bbox_loss_fn = "mse"

    det = make_detector(model, HP, 72, compute_dtype=jnp.float32,
                        pre_nms_topk=16, max_det=4,
                        pallas_stem_variables=variables,
                        pallas_stem_interpret=True)
    x = jnp.asarray((rng.uniform(size=(1, 72, 72, 3)) * 255).astype(np.uint8))
    d = det(variables, x)  # must not raise
    assert np.isfinite(np.asarray(d.scores)).all()


def test_detector_pallas_stem_path_matches(rng):
    """make_detector(pallas_stem_variables=...) must produce (nearly) the
    same detections as the standard flax path."""
    from uavdet_tpu.inference import make_detector

    cfg = (("DyConv", 32, 3, 1), ("DyConv", 64, 3, 2), ("B", 8),
           (128, 3, 2), ("B", 1), (64, 1, 1), (128, 3, 1), ("S",),
           (32, 1, 1), ("U",), (32, 1, 1), (64, 3, 1), ("S",))
    model = DyYOLO(layer_config=cfg, attn_temperature=30.0)
    x = jnp.asarray((rng.uniform(size=(2, 64, 64, 3)) * 255).astype(
        np.uint8))
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)

    class HP:
        anchors = [[[40, 30], [60, 46], [54, 36]],
                   [[18, 14], [24, 18], [30, 12]]]
        bbox_loss_fn = "mse"

    std = make_detector(model, HP, 64, compute_dtype=jnp.float32,
                        pre_nms_topk=64, max_det=8)
    fast = make_detector(model, HP, 64, compute_dtype=jnp.float32,
                         pre_nms_topk=64, max_det=8,
                         pallas_stem_variables=variables,
                         pallas_stem_interpret=True)

    d1 = std(variables, x)
    d2 = fast(variables, x)
    # stem runs in bf16 inside the kernel; scores must agree closely and
    # the kept top boxes must overlap
    np.testing.assert_allclose(np.asarray(d2.scores), np.asarray(d1.scores),
                               rtol=0.05, atol=0.01)
    np.testing.assert_allclose(np.asarray(d2.boxes[:, 0]),
                               np.asarray(d1.boxes[:, 0]),
                               rtol=0.1, atol=2.0)


def test_pallas_block_down_tro16_matches(rng):
    """The tro=16 strip geometry must agree with tro=8 (interpret)."""
    from uavdet_tpu.models.layers import CNNBlock, ResidualBlock
    from uavdet_tpu.ops.pallas_block import fold_cnnblock, pallas_block_down

    h2, w = 64, 96
    x = jnp.asarray(rng.normal(size=(1, h2, w, 64)).astype(np.float32))
    rb = ResidualBlock(64, num_repeats=1)
    rb_v = rb.init(jax.random.key(1), x, False)
    cn = CNNBlock(128, kernel_size=(3, 3), stride=(2, 2), padding=1)
    cn_v = cn.init(jax.random.key(2), rb.apply(rb_v, x, False), False)
    aug = (fold_cnnblock(rb_v["params"]["CNNBlock_0"],
                         rb_v["batch_stats"]["CNNBlock_0"]),
           fold_cnnblock(rb_v["params"]["CNNBlock_1"],
                         rb_v["batch_stats"]["CNNBlock_1"]),
           fold_cnnblock(cn_v["params"], cn_v["batch_stats"]))
    x_cm = jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.bfloat16)
    x_cm = jnp.concatenate(
        [x_cm, jnp.full((1, 64, 8, w), jnp.nan, jnp.bfloat16)], axis=2)

    a = pallas_block_down(x_cm, *aug, h2=h2, tro=8, interpret=True)
    b = pallas_block_down(x_cm, *aug, h2=h2, tro=16, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(a.astype(jnp.float32)), np.asarray(b.astype(jnp.float32)))


def test_imgfold_block_matches_flax(rng):
    """ops.imgfold: ResidualBlock(64) + CNNBlock(128,3,s2) on the
    4-image-folded layout with block-diagonal kernels must equal the
    plain flax modules exactly (the fold only adds zero terms)."""
    from uavdet_tpu.models.layers import CNNBlock, ResidualBlock
    from uavdet_tpu.ops.imgfold import (
        fold_images, folded_block_down, unfold_images)

    import flax.linen as fnn

    class Pair(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            x = ResidualBlock(64, num_repeats=1)(x, train)
            return CNNBlock(128, kernel_size=(3, 3), stride=(2, 2),
                            padding=1)(x, train)

    m = Pair()
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 64)).astype(np.float32))
    variables = m.init(jax.random.key(0), x, train=False)
    want = m.apply(variables, x, train=False)

    p, s = variables["params"], variables["batch_stats"]
    for fold in (1, 4):
        xf = fold_images(x, fold)
        yf = folded_block_down(
            xf, p["ResidualBlock_0"], s["ResidualBlock_0"],
            p["CNNBlock_0"], s["CNNBlock_0"], fold, dtype=jnp.float32)
        got = unfold_images(yf, fold)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"fold={fold}")


def test_imgfold_roundtrip(rng):
    from uavdet_tpu.ops.imgfold import fold_images, unfold_images
    x = jnp.asarray(rng.normal(size=(8, 4, 6, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(unfold_images(fold_images(x, 4), 4)), np.asarray(x))


def test_detector_imgfold_path_matches(rng, monkeypatch):
    """The imgfold fast path (tokens ["B",1],[128,3,2] consumed by the
    folded section; default-off — measured slower end-to-end, PERF.md)
    must reproduce the standard flax detector."""
    from uavdet_tpu.inference import make_detector

    monkeypatch.setenv("UAVDET_IMGFOLD", "1")

    cfg = (("DyConv", 32, 3, 1), ("DyConv", 64, 3, 2), ("B", 1),
           (128, 3, 2), ("B", 8), (256, 3, 2), (128, 1, 1),
           (256, 3, 1), ("S",), (64, 1, 1), ("U",), (64, 1, 1),
           (128, 3, 1), ("S",))
    model = DyYOLO(layer_config=cfg, attn_temperature=30.0)
    x = jnp.asarray((rng.uniform(size=(4, 64, 64, 3)) * 255).astype(
        np.uint8))
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)

    class HP:
        anchors = [[[40, 30], [60, 46], [54, 36]],
                   [[18, 14], [24, 18], [30, 12]]]
        bbox_loss_fn = "mse"

    std = make_detector(model, HP, 64, compute_dtype=jnp.float32,
                        pre_nms_topk=64, max_det=8)
    fast = make_detector(model, HP, 64, compute_dtype=jnp.float32,
                         pre_nms_topk=64, max_det=8,
                         pallas_stem_variables=variables,
                         pallas_stem_interpret=True)
    d1 = std(variables, x)
    d2 = fast(variables, x)
    np.testing.assert_allclose(np.asarray(d2.scores), np.asarray(d1.scores),
                               rtol=0.05, atol=0.01)
    np.testing.assert_allclose(np.asarray(d2.boxes[:, 0]),
                               np.asarray(d1.boxes[:, 0]),
                               rtol=0.1, atol=2.0)
    # batch 2 (not divisible by 4) must take the fold=1 path and agree too
    d3 = fast(variables, x[:2])
    np.testing.assert_allclose(np.asarray(d3.scores),
                               np.asarray(d1.scores[:2]),
                               rtol=0.05, atol=0.01)
