"""Loss-engine parity tests.

Oracle: an independent torch (CPU) implementation of the reference's
per-sample × per-head loss loop (model/_base.py:155-212) built from the
documented formulas — dynamic indexing, masked means, the lot. Our dense
vectorized JAX implementation must match it to float tolerance for both
'mse' and 'ciou' modes.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from uavdet_tpu.ops.losses import LossBreakdown, bce_with_logits, yolo_loss
from uavdet_tpu.ops.targets import encode_yolo_targets
from uavdet_tpu.utils.datatypes import DetectionResults

ANCHORS = np.array([
    [[199, 73], [315, 92], [268, 182]],
    [[91, 54], [120, 75], [157, 60]],
    [[29, 23], [48, 30], [67, 38]],
], dtype=np.float32)
HEAD_SCALES = [32, 16, 8]
INPUT = 160  # small grids (5, 10, 20) keep the test fast
LB = dict(obj_scales_w=[0.5, 1.0, 2.0], bbox_w=4.0, objectness_w=1.0,
          no_obj_w=4.0)


# ----------------------------------------------------------------- oracle


def _t_box_cxcywh_to_xyxy(b):
    cx, cy, w, h = b.unbind(-1)
    return torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _t_pairwise_iou(a, b):
    area_a = (a[:, 2] - a[:, 0]).clamp(0) * (a[:, 3] - a[:, 1]).clamp(0)
    area_b = (b[:, 2] - b[:, 0]).clamp(0) * (b[:, 3] - b[:, 1]).clamp(0)
    lt = torch.maximum(a[:, None, :2], b[None, :, :2])
    rb = torch.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter).clamp(1e-7)


def _t_ciou_loss(a, b, eps=1e-7):
    # elementwise complete IoU loss (Zheng et al.), torchvision formula
    x1, y1, x2, y2 = a.unbind(-1)
    x1g, y1g, x2g, y2g = b.unbind(-1)
    w1, h1 = x2 - x1, y2 - y1
    w2, h2 = x2g - x1g, y2g - y1g
    inter = ((torch.min(x2, x2g) - torch.max(x1, x1g)).clamp(0)
             * (torch.min(y2, y2g) - torch.max(y1, y1g)).clamp(0))
    union = w1 * h1 + w2 * h2 - inter
    iou = inter / union.clamp(eps)
    cw = torch.max(x2, x2g) - torch.min(x1, x1g)
    ch = torch.max(y2, y2g) - torch.min(y1, y1g)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((x1 + x2 - x1g - x2g) ** 2 + (y1 + y2 - y1g - y2g) ** 2) / 4
    v = (4 / torch.pi**2) * (torch.atan(w2 / h2.clamp(eps))
                             - torch.atan(w1 / h1.clamp(eps))) ** 2
    with torch.no_grad():
        alpha = v / (1 - iou + v).clamp(eps)
    return (1 - iou + rho2 / c2 + alpha * v).mean()


def oracle_loss(p_bboxes, p_objs, grids, bbox_loss_fn,
                iou_mode="elementwise", anchors=None, head_scales=None,
                lb=None):
    """Per-sample × per-head loop, following model/_base.py:155-212.

    ``iou_mode='col0'`` reproduces the reference's ``ious[:, 0]`` exactly
    (utils/postprocess.py:82): every positive pred scored against the
    FIRST positive target (torch boolean indexing order = row-major
    (A,S,S) flatten, the same order the JAX implementation uses).

    Accepts live torch tensors for the predictions (autograd flows
    through — used by the training-trajectory parity test) or anything
    np.array-able. anchors/head_scales/lb default to this module's
    fixture constants."""
    anchors = ANCHORS if anchors is None else np.asarray(anchors, np.float32)
    head_scales = HEAD_SCALES if head_scales is None else head_scales
    LB = globals()["LB"] if lb is None else lb

    def _t(x):
        return x if isinstance(x, torch.Tensor) \
            else torch.tensor(np.array(x))

    batch = p_bboxes[0].shape[0]
    bbox_losses, obj_losses = torch.tensor(0.0), torch.tensor(0.0)

    for i in range(batch):
        for h in range(len(p_bboxes)):
            sa = torch.tensor(anchors[h]) / head_scales[h]
            p_bbox = _t(p_bboxes[h][i])
            p_obj = _t(p_objs[h][i])[..., 0]
            t = _t(grids[h][i])
            t_obj, t_bbox = t[..., 0], t[..., 1:].clone()
            pos = t_obj == 1.0

            # decode (model/_base.py:214-241)
            s = torch.sigmoid(p_bbox)
            pcx, pcy = s[..., 0] * 2 - 0.5, s[..., 1] * 2 - 0.5
            pw, ph = (s[..., 2] * 2) ** 2, (s[..., 3] * 2) ** 2
            if bbox_loss_fn == "ciou":
                S = p_bbox.shape[1]
                gx = torch.arange(S).view(1, 1, S).expand(3, S, S)
                gy = torch.arange(S).view(1, S, 1).expand(3, S, S)
                pcx, pcy = pcx + gx, pcy + gy
                pw = pw * sa[:, 0].view(3, 1, 1)
                ph = ph * sa[:, 1].view(3, 1, 1)
            dec = torch.stack([pcx, pcy, pw, ph], -1)

            # iou soft labels (utils/postprocess.py:48-82), elementwise
            ip = dec.detach().clone()
            if bbox_loss_fn == "mse":
                ip[..., 2:] = ip[..., 2:] * sa.view(3, 1, 1, 2)
            ious_full = _t_pairwise_iou(
                _t_box_cxcywh_to_xyxy(ip[pos]),
                _t_box_cxcywh_to_xyxy(t_bbox[pos]))
            if iou_mode == "col0":
                ious = ious_full[:, 0]
            else:
                ious = torch.diagonal(ious_full)

            # build target (model/_base.py:250-270)
            tb = t_bbox.clone()
            if bbox_loss_fn == "mse":
                tb[..., 2:] = torch.sqrt(
                    (1e-16 + tb[..., 2:]) / sa.view(3, 1, 1, 2)) / 2
            else:
                S = tb.shape[1]
                gx = torch.arange(S).view(1, 1, S).expand(3, S, S)
                gy = torch.arange(S).view(1, S, 1).expand(3, S, S)
                tb = torch.stack(
                    [tb[..., 0] + gx, tb[..., 1] + gy,
                     tb[..., 2], tb[..., 3]], -1)

            if bbox_loss_fn == "mse":
                bl = F.mse_loss(dec[pos], tb[pos], reduction="mean")
            else:
                bl = _t_ciou_loss(_t_box_cxcywh_to_xyxy(dec[pos]),
                                  _t_box_cxcywh_to_xyxy(tb[pos]))
            bbox_losses = bbox_losses + LB["bbox_w"] * bl

            obj_losses = obj_losses + LB["objectness_w"] * LB[
                "obj_scales_w"][h] * F.binary_cross_entropy_with_logits(
                    p_obj[pos], ious * t_obj[pos])
            obj_losses = obj_losses + LB["no_obj_w"] * (
                F.binary_cross_entropy_with_logits(p_obj[~pos], t_obj[~pos]))

    return (bbox_losses / batch + obj_losses / batch,
            bbox_losses / batch, obj_losses / batch)


# ------------------------------------------------------------------ tests


def _make_case(rng, batch=2):
    boxes = np.zeros((batch, 2, 4), np.float32)
    for b in range(batch):
        for n in range(2):
            wh = rng.uniform(12, 100, size=2)
            cxy = rng.uniform(wh / 2 + 1, INPUT - wh / 2 - 1)
            boxes[b, n] = [cxy[0] - wh[0] / 2, cxy[1] - wh[1] / 2,
                           cxy[0] + wh[0] / 2, cxy[1] + wh[1] / 2]
    mask = np.ones((batch, 2), bool)
    grids = encode_yolo_targets(jnp.asarray(boxes / INPUT),
                                jnp.asarray(mask), ANCHORS,
                                HEAD_SCALES, INPUT)
    sizes = [INPUT // s for s in HEAD_SCALES]
    outs = []
    for s in sizes:
        outs.append(DetectionResults(
            bbox=jnp.asarray(
                rng.normal(size=(batch, 3, s, s, 4)).astype(np.float32)),
            obj=jnp.asarray(
                rng.normal(size=(batch, 3, s, s, 1)).astype(np.float32))))
    return outs, grids


def test_bce_matches_torch(rng):
    x = rng.normal(size=(64,)).astype(np.float32)
    z = rng.uniform(size=(64,)).astype(np.float32)
    got = np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(z)))
    want = F.binary_cross_entropy_with_logits(
        torch.tensor(x), torch.tensor(z), reduction="none").numpy()
    # XLA's f32 exp/log1p are ~1e-4-accurate approximations (vs torch's
    # libm); the formula itself is identical.
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _run_parity(rng, mode, iou_mode="elementwise"):
    outs, grids = _make_case(rng)
    got: LossBreakdown = yolo_loss(
        outs, grids, ANCHORS, HEAD_SCALES,
        LB["obj_scales_w"], LB["bbox_w"], LB["objectness_w"], LB["no_obj_w"],
        bbox_loss_fn=mode, iou_mode=iou_mode)
    want_total, want_bbox, want_obj = oracle_loss(
        [o.bbox for o in outs], [o.obj for o in outs], grids, mode,
        iou_mode=iou_mode)
    np.testing.assert_allclose(float(got.bbox), float(want_bbox),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(got.obj), float(want_obj),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(got.total), float(want_total),
                               rtol=2e-4, atol=1e-5)


def test_loss_parity_mse(rng):
    _run_parity(rng, "mse")


def test_loss_parity_ciou(rng):
    _run_parity(rng, "ciou")


def test_loss_parity_col0_mse(rng):
    """Reference-exact iou_mode='col0' (the ious[:,0] quirk) matches a
    torch oracle that uses ious_full[:, 0]; also asserts the two modes
    actually DIFFER on this multi-positive-cell case (so the test has
    discriminating power)."""
    _run_parity(rng, "mse", iou_mode="col0")
    outs, grids = _make_case(rng)
    args = (ANCHORS, HEAD_SCALES, LB["obj_scales_w"], LB["bbox_w"],
            LB["objectness_w"], LB["no_obj_w"])
    elem = yolo_loss(outs, grids, *args, bbox_loss_fn="mse")
    col0 = yolo_loss(outs, grids, *args, bbox_loss_fn="mse",
                     iou_mode="col0")
    assert float(elem.obj) != float(col0.obj)


def test_loss_is_differentiable(rng):
    import jax
    outs, grids = _make_case(rng, batch=1)

    def f(outs):
        return yolo_loss(outs, grids, ANCHORS, HEAD_SCALES,
                         LB["obj_scales_w"], LB["bbox_w"],
                         LB["objectness_w"], LB["no_obj_w"], "mse").total

    g = jax.grad(lambda o: f(o))(outs)
    for gh in g:
        assert np.isfinite(np.asarray(gh.bbox)).all()
        assert np.isfinite(np.asarray(gh.obj)).all()
        assert float(jnp.abs(gh.bbox).sum()) > 0
