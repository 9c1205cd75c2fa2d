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




def test_l1_dot_modes(rng):
    """The kernel-A dot decompositions (dot_mode 0/1/2, VERDICT r4 3b).

    mode 1 (rank-2 pre-flattened rhs) must be BITWISE equal — it only
    reshapes the rhs, same contraction. mode 2 (M-stacked block-diagonal
    dot) is only reassociation-equal: embedding each quadrant's 28-term
    contraction at a different offset of the K=128 reduction regroups
    the nonzero partial sums, measured as ~4e-6 of elements flipping one
    bf16 ULP (same rate on hardware and in interpret) — which is why
    mode 2 is NOT the shipped default."""
    from uavdet_tpu.ops.pallas_stem_split import pallas_l1

    B, H, W = 2, 128, 128  # mode 2 needs H % 128 == 0
    x = jnp.asarray((rng.uniform(size=(B, H, W, 3)) * 255)
                    .astype(np.uint8))
    k1 = jnp.asarray(rng.normal(size=(B, 32, 28)).astype(np.float32)
                     * 0.05)
    outs = {m: pallas_l1(x, k1, interpret=True, dot_mode=m)
            for m in (0, 1, 2)}
    banks0, sums0 = outs[0]
    for m in (1, 2):
        banks, sums = outs[m]
        n_bad = 0
        for q in range(4):
            a = np.asarray(banks0[q][:, :, :H // 2, :W // 2], np.float32)
            c = np.asarray(banks[q][:, :, :H // 2, :W // 2], np.float32)
            if m == 1:
                np.testing.assert_array_equal(a, c,
                                              err_msg=f"mode 1 bank {q}")
            else:
                np.testing.assert_allclose(a, c, rtol=0.008, atol=1e-3,
                                           err_msg=f"mode 2 bank {q}")
                n_bad += int((a != c).sum())
        if m == 2:  # ULP flips must stay rare (reassociation, not a bug)
            assert n_bad <= 32, n_bad
        np.testing.assert_array_equal(np.asarray(sums), np.asarray(sums0),
                                      err_msg=f"dot_mode {m} sums")


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


def test_detector_fold_early_path_matches(rng):
    """make_detector's default fold_early path (Pallas stem -> folded
    B1+128s2 -> tail2) vs the plain flax detector, and vs fold_early=False
    — the fold must change detections only at stem-bf16 noise level."""
    from uavdet_tpu.inference import make_detector

    cfg = (("DyConv", 32, 3, 1), ("DyConv", 64, 3, 2), ("B", 1),
           (128, 3, 2), ("B", 8), (256, 3, 2), (128, 1, 1),
           (256, 3, 1), ("S",), (64, 1, 1), ("U",), (64, 1, 1),
           (128, 3, 1), ("S",))
    model = DyYOLO(layer_config=cfg, attn_temperature=30.0)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)) * 255).astype(
        jnp.uint8)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)

    class HP:
        anchors = [[[40, 30], [60, 46], [54, 36]],
                   [[18, 14], [24, 18], [30, 12]]]
        bbox_loss_fn = "mse"

    kw = dict(compute_dtype=jnp.float32, pre_nms_topk=64, max_det=8)
    std = make_detector(model, HP, 64, **kw)
    plain = make_detector(model, HP, 64, pallas_stem_variables=variables,
                          pallas_stem_interpret=True, fold_early=False,
                          **kw)
    folded = make_detector(model, HP, 64, pallas_stem_variables=variables,
                           pallas_stem_interpret=True, **kw)

    d0 = std(variables, x)
    d1 = plain(variables, x)
    d2 = folded(variables, x)
    # fold vs unfolded fast path: identical stem, reassociation-level
    # early stage — scores must track tightly
    np.testing.assert_allclose(np.asarray(d2.scores), np.asarray(d1.scores),
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(d2.boxes[:, 0]),
                               np.asarray(d1.boxes[:, 0]),
                               rtol=0.05, atol=1.0)
    # and vs the plain flax path at the stem-bf16 tolerance
    np.testing.assert_allclose(np.asarray(d2.scores), np.asarray(d0.scores),
                               rtol=0.05, atol=0.01)
    np.testing.assert_allclose(np.asarray(d2.boxes[:, 0]),
                               np.asarray(d0.boxes[:, 0]),
                               rtol=0.1, atol=2.0)
