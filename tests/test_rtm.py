"""RTMUAVDet tests: shapes, the MDyConv depthwise factorization, and the
reconstructed loss helper."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uavdet_tpu.models.rtm_uav_det import (
    MDyConv, RTMUAVDet, filter_high_iou_bboxes, rtm_compute_loss)

ANCHORS = (((29, 23), (48, 30), (67, 38)),
           ((91, 54), (120, 75), (157, 60)))


def test_rtm_forward_shapes():
    m = RTMUAVDet(anchors=ANCHORS, det_scales=(16, 8))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init({"params": jax.random.key(0)}, x)
    outs = m.apply(vars_, x)
    assert len(outs) == 2
    # stem s2 + csp1 s2 = stride 4 → 16; csp2 s2 → 8
    assert outs[0].obj.shape == (1, 3, 16, 16, 1)
    assert outs[1].obj.shape == (1, 3, 8, 8, 1)
    assert outs[0].bbox.shape == (1, 3, 16, 16, 4)
    # sigmoid heads → obj in (0, 1)
    o = np.asarray(outs[0].obj)
    assert (o > 0).all() and (o < 1).all()
    # decoded boxes: centers within [-0.5, S+1.5]
    b = np.asarray(outs[0].bbox)
    assert b[..., 0].min() >= -0.5 and b[..., 0].max() <= 16.5


@pytest.mark.parametrize("impl", ["shift", "dw", "vmap"])
def test_mdyconv_factorization_matches_dense_depthwise(rng, impl):
    """kernel[b,c] = channel_w[b,c]·kernel_w[b] ⇒ depthwise conv equals
    spatial-conv-then-scale — for every _spatial_dyconv formulation."""
    B, H, W, C, K = 2, 8, 8, 6, 3
    m = MDyConv(attention_out_c=4, dy_kernel_size=K, dy_padding=1,
                dy_channel_size=C, impl=impl)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    vars_ = m.init({"params": jax.random.key(0)}, x, train=False)
    got = m.apply(vars_, x, train=False)
    assert got.shape == (B, H, W, C)

    # oracle: explicit per-sample per-channel depthwise conv
    p = vars_["params"]

    def base_fwd(x):
        kern = p["RTMConvModule_0"]["Conv_0"]["kernel"]
        y = jax.lax.conv_general_dilated(
            x, kern, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bn = vars_["batch_stats"]["RTMConvModule_0"]["BatchNorm_0"]
        sc = p["RTMConvModule_0"]["BatchNorm_0"]
        y = (y - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-5)
        y = y * sc["scale"] + sc["bias"]
        return jnp.maximum(y, 0)

    xb = base_fwd(x)
    pooled = jnp.mean(xb, axis=(1, 2))
    a = jnp.maximum(
        pooled @ p["attention"]["kernel"] + p["attention"]["bias"], 0)
    cw = a @ p["channel_fc"]["kernel"] + p["channel_fc"]["bias"]
    kw = (a @ p["kernel_fc"]["kernel"]
          + p["kernel_fc"]["bias"]).reshape(B, K, K)

    want = np.zeros((B, H, W, C), np.float32)
    for b in range(B):
        for c in range(C):
            dense = np.asarray(kw[b]) * float(cw[b, c])
            out = jax.lax.conv_general_dilated(
                np.asarray(xb[b:b + 1, :, :, c:c + 1]),
                jnp.asarray(dense)[..., None, None], (1, 1),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            want[b, :, :, c] = np.asarray(out[0, :, :, 0])
    want += np.asarray(xb)  # residual

    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("k,p", [(1, 0), (3, 1), (5, 2)])
def test_spatial_dyconv_impls_agree(rng, k, p):
    """The three formulations of the per-sample shared spatial filter are
    numerically interchangeable at every kernel size MDyEncoder uses."""
    from uavdet_tpu.models.rtm_uav_det import _spatial_dyconv
    B, H, W, C = 3, 10, 12, 7
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    kw = jnp.asarray(rng.normal(size=(B, k, k)).astype(np.float32))
    ref = np.asarray(_spatial_dyconv(x, kw, p, "vmap"))
    for impl in ("shift", "dw"):
        got = np.asarray(_spatial_dyconv(x, kw, p, impl))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=impl)


def test_filter_high_iou_bboxes():
    p = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30],
                     [100, 100, 110, 110.0]])
    s = jnp.asarray([0.9, 0.8, 0.7])
    t = jnp.asarray([[1, 1, 11, 11.0]])
    fb, fo, t_obj = filter_high_iou_bboxes(p, s, t)
    np.testing.assert_array_equal(np.asarray(fb), [[0, 0, 10, 10]])
    assert float(fo[0]) == pytest.approx(0.9)
    np.testing.assert_array_equal(np.asarray(t_obj), [1.0, 0.0, 0.0])


def test_rtm_loss_finite_and_differentiable(rng):
    m = RTMUAVDet(anchors=ANCHORS, det_scales=(16, 8))
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    vars_ = m.init({"params": jax.random.key(0)}, x)
    targets = jnp.asarray(
        np.tile(np.asarray([[10, 10, 30, 30.0]], np.float32), (2, 1, 1)))

    def loss_fn(params):
        outs = m.apply({"params": params,
                        "batch_stats": vars_["batch_stats"]}, x)
        return rtm_compute_loss(outs, targets, 64, (16, 8))

    val, grads = jax.value_and_grad(loss_fn)(vars_["params"])
    assert np.isfinite(float(val))
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0
