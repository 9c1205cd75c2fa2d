"""Checkpoint-port rehearsal — the full reference-parity protocol minus the
real asset (VERDICT r1 next #10).

Synthesizes a Lightning-format ``.ckpt`` from the reference-structure torch
oracle model (tests/test_torch_import.py), then drives the REAL protocol
end-to-end through the CLIs:

    scripts/port_reference_checkpoint.py  →  evaluate.py --dump

and asserts (a) the CLI round trip reproduces the in-process detector with
directly imported weights bit-for-bit-level, and (b) mAP@0.5 agrees with a
torch-forward-derived oracle within the 0.5-pt north-star tolerance
(BASELINE.md). When a real ``best-*.ckpt`` (reference dvc.lock:223-227)
becomes available, the same commands run unchanged.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

from tests.test_torch_import import CFG, TorchDyYOLO

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INPUT = 64
ANCHORS = [[[40, 30], [60, 46], [54, 36]],
           [[18, 14], [24, 18], [30, 12]],
           [[6, 5], [10, 6], [13, 8]]]


# CPU-pinned subprocesses must NOT see the axon TPU plugin: its
# registration connects to the single remote-compile tunnel at import
# time, so a concurrent TPU job (bench/probe on the real chip) blocks
# the subprocess into its timeout even though it never uses the TPU.
_PP = os.pathsep.join(p for p in os.environ.get(
    "PYTHONPATH", "").split(os.pathsep) if p and ".axon_site" not in p)


def _run(script, wd, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", UAVDET_PLATFORM="cpu",
               PYTHONPATH=REPO + os.pathsep + _PP)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        cwd=wd, env=env, capture_output=True, text=True, timeout=900)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("ckpt_e2e")
    from uavdet_tpu.data import make_synthetic_dataset
    make_synthetic_dataset(str(wd / "data" / "Anti-UAV-RGBT"),
                           n_seq=1, n_frames=6, img_size=128)
    params = {
        "dataset": {
            "root_dir": "data/Anti-UAV-RGBT",
            "train_loader_path": "data/train_manifest.json",
            "val_loader_path": "data/val_manifest.json",
            "test_loader_path": "data/test_manifest.json",
            "batch_size": 2, "remote": False,
            "image_size": [INPUT, INPUT],
            "workers": 1, "mosaic": False, "format": "yolo"},
        "train": {
            "seed": 211,
            "trainer": {"epochs": 1, "input_size": [3, INPUT, INPUT],
                        "profiler": None, "grad_batches": 1,
                        "train_batches": 1, "val_batches": 2,
                        "val_check_interval": 1.0, "accelerator": "cpu",
                        "devices": 1, "precision": 32,
                        "grad_clip_val": None},
            "checkpoint": {"dir": "logs/checkpoints",
                           "monitor": "val_loss", "mode": "min"}},
        "model": {
            "name": "DyYOLO",
            "hparams": {
                "anchors": ANCHORS, "head_scales": [16, 8, 4],
                "lr": 0.001, "lr_scheduler": False,
                "loss_balancing": {"obj_scales_w": [0.5, 1.0, 2.0],
                                   "bbox_w": 4.0, "objectness_w": 1.0,
                                   "no_obj_w": 4.0},
                "bbox_loss_fn": "mse", "attn_temperature": 30.0,
                "optim": {"name": "SGD", "momentum": 0.78},
                "layer_config": [list(t) for t in CFG]}}}
    with open(wd / "params.yaml", "w") as f:
        yaml.safe_dump(params, f)

    # the synthetic "reference" Lightning checkpoint
    torch.manual_seed(7)
    tm = TorchDyYOLO(CFG).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    ckpt = {"state_dict": tm.state_dict(), "epoch": 1,
            "global_step": 72573,
            "pytorch-lightning_version": "2.4.0"}
    torch.save(ckpt, wd / "best-01-2.4163.ckpt")

    r = _run("prepare_dataloader.py", wd)
    assert r.returncode == 0, r.stderr[-2000:]
    return wd, tm


@pytest.fixture(scope="module")
def ported_eval(workdir):
    """Run the two protocol CLIs once per module: port the Lightning ckpt,
    then ``evaluate.py --dump`` — the exact two commands a real
    reference checkpoint will go through."""
    wd, tm = workdir
    r = _run("scripts/port_reference_checkpoint.py", wd,
             str(wd / "best-01-2.4163.ckpt"), "logs/checkpoints")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ported" in r.stdout

    r = _run("evaluate.py", wd, "--split", "val", "--ckpt", "last",
             "--batch", "2", "--dump", str(wd / "dets.json"))
    assert r.returncode == 0, r.stderr[-2000:]
    eval_out = json.loads(r.stdout.strip().splitlines()[-1])
    dets = json.loads((wd / "dets.json").read_text())["images"]
    return eval_out, dets


def test_port_cli_then_evaluate_matches_direct_import(workdir, ported_eval):
    wd, tm = workdir
    eval_out, dets = ported_eval
    assert eval_out["images"] == len(dets) > 0

    # in-process oracle: direct import (no CLI/orbax round trip), same
    # bf16 detector, same val pipeline → detections must agree
    from uavdet_tpu.data import DataPipeline, load_manifest
    from uavdet_tpu.inference import make_detector
    from uavdet_tpu.models import build_model
    from uavdet_tpu.ops.map import MeanAveragePrecision
    from uavdet_tpu.utils.config import load_params
    from uavdet_tpu.utils.torch_import import import_interpreter_state_dict

    cfg = load_params(str(wd / "params.yaml"))
    hparams = cfg.model.hparams
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = import_interpreter_state_dict(sd, CFG)
    model = build_model("DyYOLO", hparams, dtype=jnp.bfloat16)
    detect = make_detector(model, hparams, INPUT)
    variables = {"params": params, "batch_stats": stats}

    records = load_manifest(str(wd / "data" / "val_manifest.json"))
    for rec in records:  # manifest paths are relative to the workdir
        rec["img_path"] = str(wd / rec["img_path"])
    pipe = DataPipeline(records, input_size=INPUT, batch_size=2,
                        train=False, shuffle=False, drop_last=False)

    metric = MeanAveragePrecision()
    torch_metric = MeanAveragePrecision()
    idx = 0
    for batch in iter(pipe):
        det = detect(variables, batch.image)
        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        valid = np.asarray(det.valid)
        gt = np.asarray(batch.boxes) * INPUT
        gt_mask = np.asarray(batch.box_mask)

        # torch-forward oracle detections through the same decode+NMS
        imgs = np.asarray(batch.image, np.float32)
        with torch.no_grad():
            t_outs = tm(torch.tensor(imgs).permute(0, 3, 1, 2))
        from uavdet_tpu.utils.datatypes import DetectionResults
        outs = [DetectionResults(bbox=jnp.asarray(tb.numpy()),
                                 obj=jnp.asarray(to.numpy()))
                for tb, to in t_outs]
        from uavdet_tpu.inference import decode_all_heads
        from uavdet_tpu.ops.nms import nms as nms_op
        t_boxes, t_scores = decode_all_heads(
            outs, np.asarray(ANCHORS, np.float32),
            tuple(INPUT // o.obj.shape[2] for o in outs), "mse")

        for i in range(boxes.shape[0]):
            v = valid[i]
            b = boxes[i][v]
            cxcywh = np.stack([(b[:, 0] + b[:, 2]) / 2,
                               (b[:, 1] + b[:, 3]) / 2,
                               b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], -1)
            g = gt[i][gt_mask[i]]
            g_cx = np.stack([(g[:, 0] + g[:, 2]) / 2,
                             (g[:, 1] + g[:, 3]) / 2,
                             g[:, 2] - g[:, 0], g[:, 3] - g[:, 1]], -1)
            metric.update(cxcywh, scores[i][v], g_cx)

            # CLI dump must equal the in-process detections exactly
            # (same program, orbax round trip is lossless)
            d = dets[idx]
            np.testing.assert_allclose(
                np.asarray(d["boxes_xyxy"], np.float32), b,
                rtol=1e-5, atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(d["scores"], np.float32), scores[i][v],
                rtol=1e-5, atol=1e-6)
            idx += 1

            sc = np.asarray(t_scores[i])
            top = np.argsort(-sc, kind="stable")[:512]
            keep, _, _ = nms_op(jnp.asarray(np.asarray(t_boxes[i])[top]),
                                jnp.asarray(sc[top]), 0.5, 300)
            keep = np.asarray(keep)
            kept = keep[keep >= 0]
            tb = np.asarray(t_boxes[i])[top][kept]
            ts = sc[top][kept]
            t_cx = np.stack([(tb[:, 0] + tb[:, 2]) / 2,
                             (tb[:, 1] + tb[:, 3]) / 2,
                             tb[:, 2] - tb[:, 0], tb[:, 3] - tb[:, 1]], -1)
            torch_metric.update(t_cx, ts, g_cx)

    ours = metric.compute()
    theirs = torch_metric.compute()
    # CLI mAP == in-process mAP (same detections)
    assert eval_out["map_50"] == pytest.approx(ours["map_50"], abs=1e-4)
    # torch-forward oracle within the 0.5-pt north-star tolerance
    # (bf16 detector vs f32 torch forward)
    assert ours["map_50"] == pytest.approx(theirs["map_50"], abs=0.005)
    assert ours["map"] == pytest.approx(theirs["map"], abs=0.005)


def test_dump_schema_and_golden(ported_eval):
    """Schema + pinned-golden test of the ``evaluate.py --dump`` artifact
    (the parity-protocol file a real reference checkpoint will produce).

    The dump chain is fully deterministic here (fixed synthetic dataset
    seed, fixed torch init seed, CPU backend, bf16 detector), so a golden
    sample pins the WHOLE import→orbax→detector→decode→NMS→dump chain
    against silent drift; tolerances absorb backend rounding only."""
    eval_out, dets = ported_eval

    # --- schema: every image entry carries the three keys with
    # consistent shapes and sane values
    assert len(dets) == eval_out["images"] > 0
    for d in dets:
        assert set(d) == {"boxes_xyxy", "scores", "gt_xyxy"}
        b = np.asarray(d["boxes_xyxy"], np.float32).reshape(-1, 4)
        s = np.asarray(d["scores"], np.float32)
        g = np.asarray(d["gt_xyxy"], np.float32).reshape(-1, 4)
        assert len(b) == len(s)
        assert len(g) >= 1
        assert np.isfinite(b).all() and np.isfinite(s).all()
        assert (s >= 0).all() and (s <= 1).all()
        assert (s[:-1] >= s[1:] - 1e-6).all()  # NMS keeps score order
        assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()

    # --- golden sample: first image's top detection + headline mAP,
    # pinned from the deterministic chain (synthetic dataset seed 0,
    # torch init seed 7, CPU backend, bf16 detector). Tolerances absorb
    # backend/bf16 rounding; anything larger is real protocol drift.
    d0 = dets[0]
    b0 = np.asarray(d0["boxes_xyxy"], np.float32)
    s0 = np.asarray(d0["scores"], np.float32)
    assert len(dets) == 11
    assert len(s0) == 300  # max_det saturation at the 0.001 threshold
    np.testing.assert_allclose(
        b0[0], [46.942, 2.871, 72.61, 21.371], atol=0.5,
        err_msg="top-1 box drifted — import/decode/NMS chain changed")
    assert s0[0] == pytest.approx(0.52208, abs=0.01)
    assert eval_out["map_50"] == pytest.approx(0.0014, abs=0.05)
    assert eval_out["map"] == pytest.approx(0.0002, abs=0.05)
