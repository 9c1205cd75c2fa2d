"""Data layer tests on a synthetic Anti-UAV mini-tree."""

import json
import os

import numpy as np
import pytest

from uavdet_tpu.data import (
    DataPipeline, build_index, load_manifest, make_synthetic_dataset,
    make_transform, save_manifest)
from uavdet_tpu.data.mosaic import create_mosaic_4_img


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("antiuav")
    return make_synthetic_dataset(str(root), n_seq=2, n_frames=6,
                                  img_size=160)


def test_build_index_filters_and_converts(dataset_root):
    recs = build_index(os.path.join(dataset_root, "train"), seed=11)
    assert len(recs) > 0
    cams = {r["cam_type"] for r in recs}
    assert cams == {"visible", "infrared"}  # both modality streams
    for r in recs:
        x1, y1, x2, y2 = r["bbox"]
        assert x2 > x1 and y2 > y1  # xyxy, positive
        assert os.path.exists(r["img_path"])
    # only exist==1 frames with positive w/h made it in
    with open(os.path.join(
            dataset_root, "train", "train_seq00", "visible.json")) as f:
        gt = json.load(f)
    expected_vis_seq0 = sum(
        1 for rect, e in zip(gt["gt_rect"], gt["exist"])
        if e and rect[2] > 0 and rect[3] > 0)
    got = sum(1 for r in recs
              if "train_seq00" in r["img_path"] and r["cam_type"] == "visible")
    assert got == expected_vis_seq0


def test_index_shuffle_deterministic(dataset_root):
    a = build_index(os.path.join(dataset_root, "train"), seed=11)
    b = build_index(os.path.join(dataset_root, "train"), seed=11)
    c = build_index(os.path.join(dataset_root, "train"), seed=12)
    assert [r["img_path"] for r in a] == [r["img_path"] for r in b]
    assert [r["img_path"] for r in a] != [r["img_path"] for r in c]


def test_manifest_roundtrip(dataset_root, tmp_path):
    recs = build_index(os.path.join(dataset_root, "val"), seed=11)
    p = str(tmp_path / "m.json")
    save_manifest(recs, p)
    assert load_manifest(p) == recs


def test_val_transform_is_deterministic_resize(dataset_root):
    recs = build_index(os.path.join(dataset_root, "val"), seed=11)
    from uavdet_tpu.data.pipeline import _load_image
    img = _load_image(recs[0]["img_path"])
    boxes = np.asarray([recs[0]["bbox"]], np.float32)
    tf = make_transform(64, train=False)
    rng = np.random.default_rng(0)
    out1, b1 = tf(img, boxes.copy(), rng)
    out2, b2 = tf(img, boxes.copy(), np.random.default_rng(5))
    assert out1.shape == (64, 64, 3)
    assert out1.dtype == np.float32 and out1.max() <= 1.0
    np.testing.assert_array_equal(out1, out2)  # rng-independent
    np.testing.assert_allclose(b1, b2)
    # boxes scaled by 64/160
    np.testing.assert_allclose(b1, boxes * (64 / 160), rtol=1e-5)


def test_train_transform_augments(dataset_root):
    recs = build_index(os.path.join(dataset_root, "train"), seed=11)
    from uavdet_tpu.data.pipeline import _load_image
    img = _load_image(recs[0]["img_path"])
    boxes = np.asarray([recs[0]["bbox"]], np.float32)
    tf = make_transform(64, train=True)
    out1, b1 = tf(img, boxes.copy(), np.random.default_rng(1))
    out2, b2 = tf(img, boxes.copy(), np.random.default_rng(2))
    assert out1.shape == (64, 64, 3)
    assert not np.array_equal(out1, out2)  # different rng → different affine
    if len(b1):
        assert (b1 >= 0).all() and (b1 <= 64).all()


def test_pipeline_batches(dataset_root):
    recs = build_index(os.path.join(dataset_root, "train"), seed=11)
    pipe = DataPipeline(recs, input_size=64, batch_size=4, train=True,
                        seed=11)
    batches = list(iter(pipe))
    assert len(batches) >= 1
    b = batches[0]
    assert b.image.shape == (4, 64, 64, 3)
    assert b.boxes.shape == (4, 8, 4)
    assert b.box_mask.shape == (4, 8)
    assert bool(b.box_mask[:, 0].all())  # every sample kept ≥1 box
    assert float(b.boxes.max()) <= 1.0  # normalized
    assert np.isfinite(np.asarray(b.image)).all()


def test_pipeline_workers_match_sequential(dataset_root):
    """workers>1 (native batch decode + thread pool) must reproduce the
    sequential val pipeline exactly — deterministic path, no augment RNG."""
    recs = build_index(os.path.join(dataset_root, "val"), seed=11)
    seq = DataPipeline(recs, input_size=64, batch_size=2, train=False,
                       seed=11)
    par = DataPipeline(recs, input_size=64, batch_size=2, train=False,
                       seed=11, workers=4)
    for a, b in zip(iter(seq), iter(par)):
        np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.boxes), np.asarray(b.boxes))
        np.testing.assert_array_equal(np.asarray(a.box_mask),
                                      np.asarray(b.box_mask))


def test_pipeline_workers_train_runs(dataset_root):
    """Parallel train pipeline: valid augmented batches, full epoch."""
    recs = build_index(os.path.join(dataset_root, "train"), seed=11)
    pipe = DataPipeline(recs, input_size=64, batch_size=4, train=True,
                        seed=11, workers=4)
    batches = list(iter(pipe))
    assert len(batches) == len(pipe)
    for b in batches:
        assert b.image.shape == (4, 64, 64, 3)
        assert np.isfinite(np.asarray(b.image)).all()
        assert bool(b.box_mask[:, 0].all())
    # per-sample RNG: two epochs draw different affines
    b2 = next(iter(pipe))
    assert not np.array_equal(np.asarray(batches[0].image),
                              np.asarray(b2.image))


def test_pipeline_host_throughput_scales(dataset_root):
    """The parallel producer must not be slower than sequential on a
    multi-sample manifest (smoke-level throughput guard; the real gain
    shows on many-core hosts)."""
    import time
    recs = build_index(os.path.join(dataset_root, "train"), seed=11) * 4
    seq = DataPipeline(recs, input_size=64, batch_size=4, train=False,
                       seed=11)
    par = DataPipeline(recs, input_size=64, batch_size=4, train=False,
                       seed=11, workers=4)
    t0 = time.perf_counter()
    n_seq = sum(1 for _ in seq._batches())
    t_seq = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_par = sum(1 for _ in par._batches())
    t_par = time.perf_counter() - t0
    assert n_seq == n_par
    assert t_par < t_seq * 2.0  # no pathological slowdown


def test_pipeline_format_custom(dataset_root):
    """format='custom' mirrors _custom_collate_fn: stacked equal-count box
    tensors (reference dataset/_helper.py:113-129)."""
    recs = build_index(os.path.join(dataset_root, "val"), seed=11)
    pipe = DataPipeline(recs, input_size=64, batch_size=2, train=False,
                        seed=11, fmt="custom")
    b = next(iter(pipe))
    assert b.image.shape[0] == 2
    assert bool(b.box_mask[:, 0].all())
    # unequal counts must raise (torch.stack contract)
    with pytest.raises(ValueError):
        pipe._collate([np.zeros((64, 64, 3), np.float32)] * 2,
                      [np.zeros((1, 4), np.float32),
                       np.zeros((2, 4), np.float32)])
    with pytest.raises(ValueError):
        DataPipeline(recs, input_size=64, batch_size=2, train=False,
                     fmt="nonsense")


def test_mosaic_golden():
    imgs = [np.full((100, 100, 3), i * 40, np.uint8) for i in range(4)]
    boxes = [np.array([10, 10, 50, 50], np.float32) for _ in range(4)]
    mosaic, out = create_mosaic_4_img(imgs, boxes, (64, 64))
    assert mosaic.shape == (64, 64, 3)
    assert out.shape == (4, 4)
    # first quadrant box scaled by 32/100
    np.testing.assert_allclose(out[0], [3.2, 3.2, 16.0, 16.0], rtol=1e-5)
    # second quadrant offset by 32 in x
    np.testing.assert_allclose(out[1], [35.2, 3.2, 48.0, 16.0], rtol=1e-5)


def test_mosaic_skips_degenerate():
    imgs = [np.zeros((50, 50, 3), np.uint8) for _ in range(4)]
    boxes = [np.array([10, 10, 5, 5], np.float32)] + [
        np.array([0, 0, 25, 25], np.float32)] * 3
    _, out = create_mosaic_4_img(imgs, boxes, (64, 64))
    assert len(out) == 3  # degenerate box skipped


def test_mosaic_requires_four():
    with pytest.raises(ValueError):
        create_mosaic_4_img([np.zeros((4, 4, 3), np.uint8)] * 3,
                            [np.zeros(4)] * 3)


def test_pipeline_mosaic_mode(dataset_root):
    recs = build_index(os.path.join(dataset_root, "train"), seed=11)
    pipe = DataPipeline(recs, input_size=64, batch_size=2, train=True,
                        seed=11, mosaic=True, max_boxes=8)
    batch = next(iter(pipe))
    assert batch.image.shape == (2, 64, 64, 3)
    # mosaic can contribute up to 4 boxes per sample
    assert batch.box_mask.sum() >= 2
    assert float(batch.boxes.max()) <= 1.0


def test_pipeline_epoch_reshuffles(dataset_root):
    recs = build_index(os.path.join(dataset_root, "train"), seed=11)
    pipe = DataPipeline(recs, input_size=32, batch_size=2, train=True,
                        seed=11)
    e1 = [np.asarray(b.image).sum() for b in iter(pipe)]
    e2 = [np.asarray(b.image).sum() for b in iter(pipe)]
    # different epoch -> different shuffle/augmentation stream
    assert e1 != e2
