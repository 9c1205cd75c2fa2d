"""Target encoder tests — golden values hand-derived from the reference
algorithm (dataset/AntiUAVDataset.py:141-185) plus a direct numpy port used
as an oracle for randomized cases."""

import numpy as np
import jax.numpy as jnp

from uavdet_tpu.ops.targets import encode_yolo_targets, head_sizes

ANCHORS = np.array([
    [[199, 73], [315, 92], [268, 182]],
    [[91, 54], [120, 75], [157, 60]],
    [[29, 23], [48, 30], [67, 38]],
], dtype=np.float32)  # reference params.yaml:38-56
HEAD_SCALES = [32, 16, 8]
INPUT = 640


def _wh_iou(w, h, anchors):
    inter = np.minimum(anchors[:, 0], w) * np.minimum(anchors[:, 1], h)
    union = anchors[:, 0] * anchors[:, 1] + w * h - inter
    return inter / union


def _encode_numpy(boxes_xyxy, mask):
    """Direct numpy port of the reference's sequential encoder."""
    anchors = ANCHORS / INPUT
    sizes = [INPUT // s for s in HEAD_SCALES]
    grids = [np.zeros((3, s, s, 5), np.float32) for s in sizes]
    for n in range(boxes_xyxy.shape[0]):
        if not mask[n]:
            continue
        x1, y1, x2, y2 = boxes_xyxy[n]
        cx, cy = (x1 + x2) / 2 / INPUT, (y1 + y2) / 2 / INPUT
        w, h = (x2 - x1) / INPUT, (y2 - y1) / INPUT
        for hd, s in enumerate(sizes):
            gcx, gcy = cx * s, cy * s
            gx, gy = min(int(gcx), s - 1), min(int(gcy), s - 1)
            coords = [gcx - gx, gcy - gy, w * s, h * s]
            ious = _wh_iou(w, h, anchors[hd])
            order = np.argsort(-ious, kind="stable")
            if ious[order[0]] < 0.5:
                a = order[0]
                grids[hd][a, gy, gx, 0] = 1.0
                grids[hd][a, gy, gx, 1:] = coords
            else:
                for a in range(3):
                    grids[hd][a, gy, gx, 0] = 1.0 if ious[a] >= 0.5 else 0.0
                    grids[hd][a, gy, gx, 1:] = coords
    return grids


def test_head_sizes():
    assert head_sizes(640, HEAD_SCALES) == (20, 40, 80)


def test_single_box_golden():
    # box centered at (320, 320), 64x48 px
    boxes = np.array([[[288.0, 296.0, 352.0, 344.0]]], np.float32) / INPUT
    mask = np.ones((1, 1), bool)
    grids = encode_yolo_targets(jnp.asarray(boxes), jnp.asarray(mask),
                                ANCHORS, HEAD_SCALES, INPUT)

    want = _encode_numpy(boxes[0] * INPUT, mask[0])
    for g, w in zip(grids, want):
        np.testing.assert_allclose(np.asarray(g[0]), w, rtol=1e-5, atol=1e-6)

    # the box is 64x48 px → w/h-IoU with the small-head anchors:
    # best anchor on head 2 (scale 8, S=80) should be (67, 38)
    g2 = np.asarray(grids[2][0])
    pos = np.argwhere(g2[..., 0] == 1.0)
    assert len(pos) >= 1
    # center (320,320) → grid cell (40, 40) at S=80
    assert all((p[1], p[2]) == (40, 40) for p in pos)


def test_every_head_gets_at_least_one_positive():
    rng = np.random.default_rng(0)
    for _ in range(5):
        wh = rng.uniform(10, 300, size=2)
        cxy = rng.uniform(150, 500, size=2)
        box = np.array([[[cxy[0] - wh[0] / 2, cxy[1] - wh[1] / 2,
                          cxy[0] + wh[0] / 2, cxy[1] + wh[1] / 2]]],
                       np.float32) / INPUT
        grids = encode_yolo_targets(
            jnp.asarray(box), jnp.ones((1, 1), bool), ANCHORS,
            HEAD_SCALES, INPUT)
        for g in grids:
            assert float(jnp.sum(g[..., 0] == 1.0)) >= 1.0


def test_randomized_matches_numpy_oracle(rng):
    B, N = 3, 4
    boxes = np.zeros((B, N, 4), np.float32)
    mask = rng.uniform(size=(B, N)) > 0.3
    mask[:, 0] = True
    for b in range(B):
        for n in range(N):
            wh = rng.uniform(8, 400, size=2)
            cxy = rng.uniform(wh / 2 + 1, INPUT - wh / 2 - 1)
            boxes[b, n] = [cxy[0] - wh[0] / 2, cxy[1] - wh[1] / 2,
                           cxy[0] + wh[0] / 2, cxy[1] + wh[1] / 2]
    grids = encode_yolo_targets(
        jnp.asarray(boxes / INPUT), jnp.asarray(mask), ANCHORS,
        HEAD_SCALES, INPUT)
    for b in range(B):
        want = _encode_numpy(boxes[b], mask[b])
        for g, w in zip(grids, want):
            np.testing.assert_allclose(
                np.asarray(g[b]), w, rtol=1e-4, atol=1e-5)


def test_padding_writes_nothing():
    boxes = np.array([[[100, 100, 200, 200.0]]], np.float32) / INPUT
    grids = encode_yolo_targets(
        jnp.asarray(boxes), jnp.zeros((1, 1), bool), ANCHORS,
        HEAD_SCALES, INPUT)
    for g in grids:
        assert float(jnp.abs(g).sum()) == 0.0
