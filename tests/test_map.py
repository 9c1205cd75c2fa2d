"""mAP tests — hand-computed golden cases for COCO 101-point AP."""

import numpy as np
import pytest

from uavdet_tpu.ops.map import MeanAveragePrecision, calculate_ap


def _box(cx, cy, w, h):
    return [cx, cy, w, h]  # cxcywh


def test_perfect_detection():
    m = MeanAveragePrecision()
    m.update([_box(50, 50, 20, 20)], [0.9], [_box(50, 50, 20, 20)])
    out = m.compute()
    assert out["map"] == pytest.approx(1.0)
    assert out["map_50"] == pytest.approx(1.0)
    assert out["map_75"] == pytest.approx(1.0)


def test_miss_gives_zero():
    m = MeanAveragePrecision()
    m.update([_box(200, 200, 10, 10)], [0.9], [_box(50, 50, 20, 20)])
    out = m.compute()
    assert out["map"] == pytest.approx(0.0)


def test_half_iou_boxes():
    # det shifted so IoU ~ 0.58: TP at thr<=0.55, FP above
    gt = _box(50, 50, 20, 20)
    det = _box(55, 50, 20, 20)  # overlap 15x20=300, union 500 → IoU 0.6
    m = MeanAveragePrecision()
    m.update([det], [0.9], [gt])
    out = m.compute()
    # thresholds 0.5, 0.55, 0.6 pass (IoU≥thr), 0.65+ fail → 3/10
    assert out["map_50"] == pytest.approx(1.0)
    assert out["map_75"] == pytest.approx(0.0)
    assert out["map"] == pytest.approx(0.3)


def test_precision_recall_interpolation():
    # 2 GT, 3 dets: hit(0.9), miss(0.8), hit(0.7)
    gts = [_box(50, 50, 20, 20), _box(150, 150, 20, 20)]
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update(
        [gts[0], _box(300, 300, 20, 20), gts[1]],
        [0.9, 0.8, 0.7],
        gts)
    out = m.compute()
    # PR points: r=0.5 p=1.0; r=0.5 p=0.5; r=1.0 p=2/3
    # envelope: p(r<=0.5)=1.0, p(0.5<r<=1.0)=2/3
    # 101-pt: 51 points at 1.0, 50 at 2/3
    want = (51 * 1.0 + 50 * (2 / 3)) / 101
    assert out["map_50"] == pytest.approx(want, abs=1e-6)


def test_score_ordering_matters():
    # same boxes, FP ranked above the TP → precision at recall drops
    gt = [_box(50, 50, 20, 20)]
    m1 = MeanAveragePrecision(iou_thresholds=[0.5])
    m1.update([gt[0], _box(300, 300, 10, 10)], [0.9, 0.1], gt)
    m2 = MeanAveragePrecision(iou_thresholds=[0.5])
    m2.update([gt[0], _box(300, 300, 10, 10)], [0.1, 0.9], gt)
    a1, a2 = m1.compute()["map_50"], m2.compute()["map_50"]
    assert a1 == pytest.approx(1.0)
    assert a2 < a1
    # FP first: PR = (r=0,p=0), (r=1,p=0.5); COCO envelope takes max
    # precision at recall ≥ r → 0.5 at every recall point
    assert a2 == pytest.approx(0.5, abs=1e-6)


def test_each_gt_matched_once():
    # two dets on one GT: second is FP
    gt = [_box(50, 50, 20, 20)]
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update([gt[0], gt[0]], [0.9, 0.8], gt)
    out = m.compute()
    # recall 1 at det1 (p=1), det2 FP (p=0.5) → interp: all 1.0
    assert out["map_50"] == pytest.approx(1.0)


def test_area_buckets():
    m = MeanAveragePrecision()
    m.update([_box(50, 50, 10, 10)], [0.9], [_box(50, 50, 10, 10)])  # small
    out = m.compute()
    assert out["map_small"] == pytest.approx(1.0)
    assert out["map_medium"] == -1.0  # no medium GT
    assert out["map_large"] == -1.0


def test_multi_image_accumulation():
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update([_box(50, 50, 20, 20)], [0.9], [_box(50, 50, 20, 20)])
    m.update([_box(300, 300, 10, 10)], [0.95], [_box(50, 50, 20, 20)])
    out = m.compute()
    # dataset-level: FP@0.95, TP@0.9, 2 GT → rec 0.5, interp below
    want = (51 * 0.5 + 0) / 101
    assert out["map_50"] == pytest.approx(want, abs=0.01)


def test_calculate_ap_wrapper():
    out = calculate_ap([_box(10, 10, 4, 4)], [0.8], [_box(10, 10, 4, 4)])
    assert out["map"] == pytest.approx(1.0)


@pytest.mark.skipif(
    not pytest.importorskip("torch", reason="torch needed"),
    reason="torch missing")
def test_against_torchmetrics_if_available():
    try:
        from torchmetrics.detection import MeanAveragePrecision as TMAP
    except ImportError:
        pytest.skip("torchmetrics not available")
    import torch
    rng = np.random.default_rng(3)
    ours = MeanAveragePrecision()
    theirs = TMAP(box_format="cxcywh",
                  iou_thresholds=[0.5 + 0.05 * i for i in range(10)],
                  max_detection_thresholds=[300] * 3)
    for _ in range(4):
        n_det, n_gt = 8, 3
        det = rng.uniform(20, 200, size=(n_det, 4))
        det[:, 2:] = rng.uniform(5, 60, size=(n_det, 2))
        gt = rng.uniform(20, 200, size=(n_gt, 4))
        gt[:, 2:] = rng.uniform(5, 60, size=(n_gt, 2))
        sc = rng.uniform(size=n_det)
        ours.update(det, sc, gt)
        theirs.update(
            [dict(boxes=torch.tensor(det), scores=torch.tensor(sc),
                  labels=torch.ones(n_det, dtype=torch.int64))],
            [dict(boxes=torch.tensor(gt),
                  labels=torch.ones(n_gt, dtype=torch.int64))])
    got = ours.compute()
    want = theirs.compute()
    assert got["map"] == pytest.approx(float(want["map"]), abs=1e-3)
    assert got["map_50"] == pytest.approx(float(want["map_50"]), abs=1e-3)


def test_two_class_free_single_class_multi_gt_partial():
    # 3 GT, 2 TP + 1 FN at 0.5 threshold
    gts = [_box(50, 50, 20, 20), _box(150, 150, 20, 20),
           _box(250, 250, 20, 20)]
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update([gts[0], gts[1]], [0.9, 0.8], gts)
    out = m.compute()
    # PR: (r=1/3, p=1), (r=2/3, p=1) → interp: p=1 for r<=2/3, 0 beyond
    # 101-pt: recall points 0..0.66 (67 points) at 1.0
    want = 67 / 101
    assert out["map_50"] == pytest.approx(want, abs=1e-6)


def test_max_det_truncation():
    gt = [_box(50, 50, 20, 20)]
    m = MeanAveragePrecision(iou_thresholds=[0.5], max_det=1)
    # TP has LOWER score than an FP: with max_det=1 only the FP survives
    m.update([gt[0], _box(300, 300, 10, 10)], [0.2, 0.9], gt)
    out = m.compute()
    assert out["map_50"] == pytest.approx(0.0)


def test_duplicate_scores_stable_order():
    gt = [_box(50, 50, 20, 20)]
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    # two dets with identical scores: first in input order matches first
    m.update([gt[0], _box(51, 50, 20, 20)], [0.5, 0.5], gt)
    out = m.compute()
    assert out["map_50"] == pytest.approx(1.0)


# --------------------------------------------------------------------------
# Adversarial protocol goldens — hand-traced against pycocotools semantics
# (what torchmetrics delegates to; reference utils/metrics.py:88-135). Each
# case is constructed so a wrong protocol choice flips the result.
# --------------------------------------------------------------------------


def test_nonignored_gt_preferred_over_higher_iou_ignored():
    """pycocotools matching prefers ANY non-ignored GT over an ignored one,
    even at lower IoU. Area 'small': GT_A 10x10 (area 100, in range),
    GT_B 40x40 (area 1600, medium → ignored in 'small'). Det 24x24 has
    IoU 100/576≈0.174 with A and 576/1600=0.36 with B; at thr 0.15 both
    qualify, but the det must take A → TP → map_small=1. A highest-IoU
    matcher would take B → det ignored → recall 0 → map_small=0."""
    m = MeanAveragePrecision(iou_thresholds=[0.15])
    m.update([_box(50, 50, 24, 24)], [0.9],
             [_box(50, 50, 10, 10), _box(50, 50, 40, 40)])
    out = m.compute()
    assert out["map_small"] == pytest.approx(1.0)


def test_unmatched_det_outside_area_range_is_ignored_not_fp():
    """'small' eval: an unmatched 100x100 det (area 10000, out of range)
    ranked ABOVE the TP must be dropped as ignored, not counted FP.
    Hand-trace if wrongly FP: order [FP .95, TP .9] → prec envelope 0.5 →
    AP 0.5. Correct: AP 1.0."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update([_box(300, 300, 100, 100), _box(50, 50, 10, 10)], [0.95, 0.9],
             [_box(50, 50, 10, 10)])
    out = m.compute()
    assert out["map_small"] == pytest.approx(1.0)


def test_unmatched_det_inside_area_range_is_fp():
    """Control for the previous golden: the same stray det but 10x10
    (area 100, IN range) IS a false positive → map_small 0.5."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update([_box(300, 300, 10, 10), _box(50, 50, 10, 10)], [0.95, 0.9],
             [_box(50, 50, 10, 10)])
    out = m.compute()
    assert out["map_small"] == pytest.approx(0.5)


def test_score_tie_across_images_keeps_update_order():
    """Equal scores across images: pycocotools sorts with MERGESORT, so
    the image updated first keeps rank priority. Image 0 contributes an
    unmatched det (FP), image 1 a perfect det (TP), both score 0.5.
    Stable order [FP, TP] → rec [0,1], prec [0,0.5] → envelope 0.5 →
    AP 0.5. An unstable sort that flips them would give AP 1.0."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update([_box(300, 300, 20, 20)], [0.5], np.zeros((0, 4)))
    m.update([_box(50, 50, 20, 20)], [0.5], [_box(50, 50, 20, 20)])
    out = m.compute()
    assert out["map_50"] == pytest.approx(0.5)


def test_mar_key_per_max_detection_threshold():
    """Reference passes max_detection_thresholds=[300]*3 → the result
    dict carries ONE mar_300 key (torchmetrics names keys after the
    thresholds; utils/metrics.py:114-118). 2 GT, 1 TP → mar_300 = 0.5."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update([_box(50, 50, 20, 20)], [0.9],
             [_box(50, 50, 20, 20), _box(150, 150, 20, 20)])
    out = m.compute()
    assert out["mar_300"] == pytest.approx(0.5)
    assert out["mar_max_det"] == out["mar_300"]
    assert out["map_per_class"] == -1.0
    assert out["mar_300_per_class"] == -1.0
    assert out["classes"] == 1


def test_mar_1_10_100_thresholds():
    """torchmetrics-default thresholds [1,10,100]: with 2 TPs, mar_1 caps
    each image at its single highest-score det (→ recall 0.5) while
    mar_10/mar_100 see both (→ 1.0); AP always uses the LAST threshold."""
    m = MeanAveragePrecision(iou_thresholds=[0.5],
                             max_detection_thresholds=[1, 10, 100])
    gts = [_box(50, 50, 20, 20), _box(150, 150, 20, 20)]
    m.update(gts, [0.9, 0.8], gts)
    out = m.compute()
    assert out["mar_1"] == pytest.approx(0.5)
    assert out["mar_10"] == pytest.approx(1.0)
    assert out["mar_100"] == pytest.approx(1.0)
    assert out["map_50"] == pytest.approx(1.0)


def test_mar_thresholds_unsorted():
    """max_detection_thresholds need not arrive sorted (torchmetrics sorts
    them): detections must be stored to the LARGEST threshold, so
    mar_10/mar_100 are unaffected by a trailing smaller entry."""
    m = MeanAveragePrecision(iou_thresholds=[0.5],
                             max_detection_thresholds=[100, 10, 1])
    gts = [_box(50, 50, 20, 20), _box(150, 150, 20, 20)]
    m.update(gts, [0.9, 0.8], gts)
    out = m.compute()
    assert out["mar_1"] == pytest.approx(0.5)
    assert out["mar_10"] == pytest.approx(1.0)
    assert out["mar_100"] == pytest.approx(1.0)


def test_mar_area_buckets():
    """mar_{small,medium,large}: recall per GT-area bucket at the last
    max-det threshold; buckets with no GT report -1."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update([_box(50, 50, 10, 10)], [0.9],
             [_box(50, 50, 10, 10), _box(300, 300, 50, 50)])  # small+medium
    out = m.compute()
    assert out["mar_small"] == pytest.approx(1.0)
    assert out["mar_medium"] == pytest.approx(0.0)
    assert out["mar_large"] == -1.0


def test_ignored_gt_not_in_recall_denominator():
    """A GT outside the area range must not inflate the recall
    denominator: 1 small GT (matched) + 1 large GT → recall_small = 1/1,
    not 1/2."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update([_box(50, 50, 10, 10)], [0.9],
             [_box(50, 50, 10, 10), _box(300, 300, 200, 200)])
    out = m.compute()
    assert out["mar_small"] == pytest.approx(1.0)
    assert out["map_small"] == pytest.approx(1.0)


def test_iou_threshold_sweep_monotone(rng):
    # AP must be non-increasing in the IoU threshold
    gt = [_box(50, 50, 20, 20)]
    det = [_box(53, 50, 20, 20)]
    aps = []
    for t in (0.5, 0.6, 0.7, 0.8, 0.9):
        m = MeanAveragePrecision(iou_thresholds=[t])
        m.update(det, [0.9], gt)
        aps.append(m.compute()["map"])
    assert all(a >= b - 1e-9 for a, b in zip(aps, aps[1:]))
