"""End-to-end entry-point tests: the two-stage pipeline + evaluate on a
synthetic dataset with a tiny model, on the CPU test platform."""

import json
import os
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [["DyConv", 8, 3, 1], [16, 3, 2], ["B", 1], [32, 3, 2], ["B", 8],
        [64, 3, 2], ["B", 8], [128, 3, 2], ["B", 1], [64, 1, 1],
        [128, 3, 1], ["S"], [32, 1, 1], ["U"], [32, 1, 1], [64, 3, 1],
        ["S"], [16, 1, 1], ["U"], [16, 1, 1], [32, 3, 1], ["S"]]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("e2e")
    from uavdet_tpu.data import make_synthetic_dataset
    make_synthetic_dataset(str(wd / "data" / "Anti-UAV-RGBT"),
                           n_seq=1, n_frames=6, img_size=128)
    params = {
        "dataset": {
            "root_dir": "data/Anti-UAV-RGBT",
            "train_loader_path": "data/train_manifest.json",
            "val_loader_path": "data/val_manifest.json",
            "test_loader_path": "data/test_manifest.json",
            "batch_size": 2, "remote": False, "image_size": [64, 64],
            "workers": 2, "mosaic": False, "format": "yolo"},
        "train": {
            "seed": 211,
            "trainer": {
                "epochs": 1, "input_size": [3, 64, 64], "profiler": None,
                "grad_batches": 1, "train_batches": 2, "val_batches": 2,
                "val_check_interval": 1.0, "accelerator": "cpu",
                "devices": 1, "precision": 32, "grad_clip_val": None},
            "checkpoint": {"dir": "logs/checkpoints",
                           "monitor": "val_loss", "mode": "min"}},
        "model": {
            "name": "DyYOLO",
            "hparams": {
                "anchors": [[[40, 30], [60, 46], [54, 36]],
                            [[18, 14], [24, 18], [30, 12]],
                            [[6, 5], [10, 6], [13, 8]]],
                "head_scales": [16, 8, 4], "lr": 0.001,
                "lr_scheduler": False,
                "loss_balancing": {"obj_scales_w": [0.5, 1.0, 2.0],
                                   "bbox_w": 4.0, "objectness_w": 1.0,
                                   "no_obj_w": 4.0},
                "bbox_loss_fn": "mse", "attn_temperature": 30.0,
                "optim": {"name": "SGD", "momentum": 0.78},
                "layer_config": TINY}}}
    with open(wd / "params.yaml", "w") as f:
        yaml.safe_dump(params, f)
    return wd


# axon-free PYTHONPATH: the TPU plugin's import-time tunnel connection
# would block CPU-pinned subprocesses whenever the chip is busy
_PP = os.pathsep.join(p for p in os.environ.get(
    "PYTHONPATH", "").split(os.pathsep) if p and ".axon_site" not in p)


def _run(script, wd, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               UAVDET_PLATFORM="cpu",
               PYTHONPATH=REPO + os.pathsep + _PP)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        cwd=wd, env=env, capture_output=True, text=True, timeout=900)


def test_stage1_prepare(workdir):
    r = _run("prepare_dataloader.py", workdir)
    assert r.returncode == 0, r.stderr[-2000:]
    for split in ("train", "val", "test"):
        p = workdir / "data" / f"{split}_manifest.json"
        assert p.exists()
        recs = json.loads(p.read_text())["records"]
        assert len(recs) > 0


def test_stage2_train(workdir):
    r = _run("train.py", workdir)
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads((workdir / "dvclive" / "metrics.json").read_text())
    assert "train" in metrics and "val" in metrics
    assert metrics["train"]["loss"] > 0
    # reference metrics.json carries top-level step + epoch keys
    # (/root/reference/dvclive/metrics.json:1-14)
    assert "step" in metrics and metrics["epoch"] == 0
    # plots contract (dvc.yaml)
    for split in ("train", "val"):
        for m in ("loss", "bbox_loss", "obj_loss"):
            assert (workdir / "dvclive" / "plots" / "metrics" / split /
                    f"{m}.tsv").exists()
    # checkpoints: best + last
    names = os.listdir(workdir / "logs" / "checkpoints")
    assert "last" in names
    assert any(n.startswith("best-") for n in names)


def test_stage3_evaluate(workdir):
    r = _run("evaluate.py", workdir, "--split", "val", "--ckpt", "last",
             "--batch", "2", "--limit", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "map" in out and "map_50" in out
    assert out["images"] > 0


def test_detect_cli(workdir):
    """scripts/detect.py: arbitrary frames → detections JSON in
    original-image pixel coordinates (+ annotated copies). Frames are laid
    out Anti-UAV-style — two sequence dirs with IDENTICAL frame names —
    so basename-keyed results would silently collide (ADVICE r2)."""
    import glob as _glob
    import shutil
    src = sorted(_glob.glob(str(
        workdir / "data" / "Anti-UAV-RGBT" / "train" / "*" / "visible"
        / "*.jpg")))
    assert src
    for seq in ("seqA", "seqB"):
        d = workdir / "frames" / seq / "visible"
        os.makedirs(d, exist_ok=True)
        for p in src:
            shutil.copy(p, d / os.path.basename(p))
    glob_pat = str(workdir / "frames" / "*" / "visible" / "*.jpg")
    n_frames = len(_glob.glob(glob_pat))
    assert n_frames == 2 * len(src)
    r = _run("scripts/detect.py", workdir, "--images", glob_pat,
             "--out", "dets.json", "--score", "0.0",
             "--batch", "2", "--draw", "annotated")
    assert r.returncode == 0, r.stderr[-2000:]
    dets = json.loads((workdir / "dets.json").read_text())
    first = next(iter(dets.values()))
    assert "boxes_xyxy" in first and "scores" in first
    # every frame keyed (relative to the glob root) — no collisions
    assert len(dets) == n_frames
    assert all(k.startswith(("seqA", "seqB")) for k in dets)
    # annotated copies mirror the relative tree (no flattening)
    ann = [os.path.join(dp, f)
           for dp, _, fs in os.walk(workdir / "annotated") for f in fs]
    assert len(ann) == n_frames
