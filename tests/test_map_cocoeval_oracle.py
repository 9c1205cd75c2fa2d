"""Independent COCOeval transcription as a second mAP oracle.

The reference's metric is torchmetrics ``MeanAveragePrecision``, which
evaluates the pycocotools COCOeval bbox protocol (torchmetrics 1.5.0
default backend). The real wheel is absent from this image (the suite's
one skipped test), so this file transcribes COCOeval's ``evaluateImg`` +
``accumulate`` directly from the pycocotools algorithm — deliberately
keeping pycocotools' own control flow, matrix names (gtm/dtm/dtIg) and
quirks (mergesort ordering, ``min(t, 1-1e-10)``, the non-ignored-break
rule) and NOT the vectorization style of ``ops/map.py`` — and
property-tests ``ops/map.py`` against it on randomized scenes.

Two independently structured implementations agreeing bitwise across
random clustered scenes, area ranges, IoU grids and max-det caps is the
strongest parity evidence available without the wheel.
"""

import numpy as np
import pytest

from uavdet_tpu.ops.map import MeanAveragePrecision

_AREA = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
_REC_THRS = np.linspace(0.0, 1.0, 101)


def _iou(dt, gt):
    """xyxy IoU matrix (dt, gt) — pycocotools box semantics."""
    out = np.zeros((len(dt), len(gt)))
    for i, d in enumerate(dt):
        for j, g in enumerate(gt):
            ix = max(0.0, min(d[2], g[2]) - max(d[0], g[0]))
            iy = max(0.0, min(d[3], g[3]) - max(d[1], g[1]))
            inter = ix * iy
            ad = (d[2] - d[0]) * (d[3] - d[1])
            ag = (g[2] - g[0]) * (g[3] - g[1])
            u = ad + ag - inter
            out[i, j] = inter / u if u > 0 else 0.0
    return out


def _evaluate_img(dts, scores, gts, iou_thrs, a_rng, max_det):
    """COCOeval.evaluateImg transcription (bbox, single category,
    iscrowd absent)."""
    lo, hi = a_rng
    g_area = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    gt_ig = (g_area < lo) | (g_area > hi)
    gtind = np.argsort(gt_ig, kind="mergesort")
    gts = gts[gtind]
    gt_ig = gt_ig[gtind].astype(float)

    dtind = np.argsort(-scores, kind="mergesort")[:max_det]
    dts = dts[dtind]
    scores = scores[dtind]
    ious = _iou(dts, gts)

    T, D, G = len(iou_thrs), len(dts), len(gts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    dt_ig = np.zeros((T, D))
    for tind, t in enumerate(iou_thrs):
        for dind in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                if gtm[tind, gind] > 0:
                    continue
                if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig[tind, dind] = gt_ig[m]
            dtm[tind, dind] = m + 1       # 1-based gt "id"
            gtm[tind, m] = dind + 1
    d_area = (dts[:, 2] - dts[:, 0]) * (dts[:, 3] - dts[:, 1])
    a = (d_area < lo) | (d_area > hi)
    dt_ig = np.logical_or(dt_ig, np.logical_and(
        dtm == 0, np.repeat(a[None, :], T, axis=0)))
    return dict(dtMatches=dtm, dtIgnore=dt_ig, gtIgnore=gt_ig,
                dtScores=scores)


def _accumulate(evals, T):
    """COCOeval.accumulate transcription for one (area, maxDet) cell."""
    dt_scores = np.concatenate([e["dtScores"] for e in evals])
    inds = np.argsort(-dt_scores, kind="mergesort")
    dtm = np.concatenate([e["dtMatches"] for e in evals], axis=1)[:, inds]
    dt_ig = np.concatenate([e["dtIgnore"] for e in evals], axis=1)[:, inds]
    gt_ig = np.concatenate([e["gtIgnore"] for e in evals])
    npig = int(np.count_nonzero(gt_ig == 0))
    if npig == 0:
        return np.full(T, -1.0), np.full(T, -1.0)
    tps = np.logical_and(dtm, np.logical_not(dt_ig))
    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
    precision = np.zeros(T)
    recall = np.zeros(T)
    for t in range(T):
        tp = np.cumsum(tps[t]).astype(float)
        fp = np.cumsum(fps[t]).astype(float)
        nd = len(tp)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        recall[t] = rc[-1] if nd else 0.0
        pr = pr.tolist()
        q = [0.0] * 101
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds_r = np.searchsorted(rc, _REC_THRS, side="left")
        for ri, pi in enumerate(inds_r):
            if pi < nd:
                q[ri] = pr[pi]
        precision[t] = np.mean(q)
    return precision, recall


def _oracle(images, iou_thrs, area="all", max_det=100):
    evals = [_evaluate_img(d, s, g, iou_thrs, _AREA[area], max_det)
             for d, s, g in images]
    return _accumulate(evals, len(iou_thrs))


def _random_scene(rng, n_gt, n_dt, field=200.0, cluster=0.6):
    """Clustered boxes: most detections perturb a GT (forcing overlap
    chains and matching ambiguity), the rest are background."""
    gts = np.zeros((n_gt, 4))
    gts[:, :2] = rng.uniform(0, field, (n_gt, 2))
    gts[:, 2:] = gts[:, :2] + rng.uniform(4, 90, (n_gt, 2))
    dts = np.zeros((n_dt, 4))
    for i in range(n_dt):
        if n_gt and rng.uniform() < cluster:
            base = gts[rng.integers(n_gt)]
            jitter = rng.uniform(-12, 12, 4)
            dts[i] = base + jitter
            dts[i, 2] = max(dts[i, 2], dts[i, 0] + 2)
            dts[i, 3] = max(dts[i, 3], dts[i, 1] + 2)
        else:
            dts[i, :2] = rng.uniform(0, field, 2)
            dts[i, 2:] = dts[i, :2] + rng.uniform(4, 90, 2)
    # duplicated scores exercise mergesort tie-breaking
    scores = np.round(rng.uniform(size=n_dt), 2)
    return dts, scores, gts


@pytest.mark.parametrize("seed", range(6))
def test_matches_cocoeval_transcription_random(seed):
    rng = np.random.default_rng(seed)
    iou_thrs = np.asarray([0.5 + 0.05 * i for i in range(10)])
    images = [_random_scene(rng, rng.integers(0, 7), rng.integers(0, 12))
              for _ in range(5)]

    for area in ("all", "small", "medium", "large"):
        for max_det in (3, 100):
            want_p, want_r = _oracle(images, iou_thrs, area, max_det)

            m = MeanAveragePrecision(box_format="xyxy",
                                     iou_thresholds=iou_thrs,
                                     max_det=max_det)
            for d, s, g in images:
                m.update(d, s, g)
            got_p, got_r = m._evaluate_area(area, max_det)

            np.testing.assert_allclose(
                got_p, want_p, rtol=0, atol=1e-12,
                err_msg=f"AP mismatch seed={seed} area={area} "
                        f"maxDet={max_det}")
            np.testing.assert_allclose(
                got_r, want_r, rtol=0, atol=1e-12,
                err_msg=f"AR mismatch seed={seed} area={area} "
                        f"maxDet={max_det}")


def test_matches_cocoeval_result_keys():
    """compute()'s headline keys equal the oracle's means over the same
    IoU grid (single random scene set)."""
    rng = np.random.default_rng(99)
    iou_thrs = np.asarray([0.5 + 0.05 * i for i in range(10)])
    images = [_random_scene(rng, 4, 9) for _ in range(4)]
    m = MeanAveragePrecision(box_format="xyxy", iou_thresholds=iou_thrs,
                             max_det=100)
    for d, s, g in images:
        m.update(d, s, g)
    out = m.compute()
    p, r = _oracle(images, iou_thrs, "all", 100)
    assert out["map"] == pytest.approx(p[p > -1].mean(), abs=1e-12)
    assert out["map_50"] == pytest.approx(p[0], abs=1e-12)
    assert out["map_75"] == pytest.approx(p[5], abs=1e-12)
    assert out["mar_100"] == pytest.approx(r[r > -1].mean(), abs=1e-12)


# ---------------------------------------------------------------------------
# Adversarial goldens (VERDICT r3 item 6): deterministic corner scenes that
# pin the protocol's tie-breaking/boundary semantics — score-tie ordering
# across images, degenerate + edge-touching boxes, exact-threshold IoU,
# max_det saturation, exact area-range boundaries — without the wheel.

_IOU_THRS = np.asarray([0.5 + 0.05 * i for i in range(10)])


def _assert_parity(images, areas=("all", "small", "medium", "large"),
                   max_dets=(1, 3, 100), msg=""):
    for area in areas:
        for max_det in max_dets:
            want_p, want_r = _oracle(images, _IOU_THRS, area, max_det)
            m = MeanAveragePrecision(box_format="xyxy",
                                     iou_thresholds=_IOU_THRS,
                                     max_det=max_det)
            for d, s, g in images:
                m.update(d, s, g)
            got_p, got_r = m._evaluate_area(area, max_det)
            np.testing.assert_allclose(
                got_p, want_p, rtol=0, atol=1e-12,
                err_msg=f"{msg} AP area={area} maxDet={max_det}")
            np.testing.assert_allclose(
                got_r, want_r, rtol=0, atol=1e-12,
                err_msg=f"{msg} AR area={area} maxDet={max_det}")


def test_adversarial_score_ties_across_images():
    """IDENTICAL scores spread across images: accumulate()'s global
    mergesort must interleave detections in image-update order (stable
    sort over the concatenation) — a pure tie-ordering golden."""
    g1 = np.array([[0., 0., 40., 40.], [100., 100., 150., 150.]])
    g2 = np.array([[10., 10., 60., 60.]])
    # every detection scores 0.5; one TP and one FP per image
    d1 = np.array([[0., 0., 40., 40.], [300., 300., 340., 340.]])
    d2 = np.array([[10., 10., 60., 60.], [200., 200., 240., 240.]])
    s = np.array([0.5, 0.5])
    images = [(d1, s, g1), (d2, s, g2)]
    _assert_parity(images, msg="score-ties")
    # tie straddling the max_det cut inside ONE image
    d3 = np.array([[0., 0., 40., 40.], [1., 1., 41., 41.],
                   [2., 2., 42., 42.]])
    _assert_parity([(d3, np.array([0.7, 0.7, 0.7]), g1)],
                   max_dets=(1, 2, 3), msg="tie-at-cut")


def test_adversarial_degenerate_and_edge_boxes():
    """Zero-area GT and DT boxes (pycocotools keeps them: area 0 is NOT
    ignored by the 'all'/'small' ranges, IoU against them is 0 — the
    u > 0 guard), exactly-coincident dt==gt (IoU exactly 1), edge-touching
    boxes (intersection exactly 0), and IoU exactly at the 0.5 threshold
    (matched: the comparison is ``ious < min(t, 1-1e-10)``)."""
    gts = np.array([
        [0., 0., 10., 10.],     # normal
        [5., 5., 5., 9.],       # zero-width GT
        [50., 50., 60., 60.],   # normal
    ])
    dts = np.array([
        [0., 0., 10., 10.],     # IoU exactly 1 with gt0
        [10., 0., 20., 10.],    # edge-touches gt0: IoU exactly 0
        [5., 5., 5., 9.],       # zero-area dt coincident with zero-area gt
        [50., 50., 60., 55.],   # IoU exactly 0.5 with gt2 (inter 50/100)
    ])
    scores = np.array([0.9, 0.8, 0.7, 0.6])
    _assert_parity([(dts, scores, gts)], msg="degenerate/edge")


def test_adversarial_max_det_saturation():
    """n_dt >> max_det: the per-image top-max_det cut happens BEFORE
    matching (evaluateImg) and again nothing re-enters at accumulate."""
    rng = np.random.default_rng(7)
    gts = np.array([[0., 0., 50., 50.], [100., 0., 150., 50.]])
    base = np.concatenate([np.tile(gts[0], (6, 1)), np.tile(gts[1], (6, 1))])
    dts = base + rng.uniform(-3, 3, base.shape)
    scores = np.round(rng.uniform(size=len(dts)), 1)  # heavy ties
    _assert_parity([(dts, scores, gts)], max_dets=(1, 2, 5, 100),
                   msg="max_det-saturation")


def test_adversarial_area_range_boundaries():
    """Areas EXACTLY at the 32² and 96² COCO boundaries: the ignore rule
    is ``area < lo or area > hi``, so a 1024-area box is counted by BOTH
    'small' (0,1024] and 'medium' [1024,9216] — pinned here."""
    gts = np.array([
        [0., 0., 32., 32.],      # area exactly 32² = 1024
        [100., 0., 196., 96.],   # area exactly 96² = 9216
        [300., 0., 301., 1.],    # area 1 (tiny)
    ])
    dts = gts.copy()
    scores = np.array([0.9, 0.8, 0.7])
    _assert_parity([(dts, scores, gts)], msg="area-boundaries")
