#!/usr/bin/env python
"""Evaluation entry: detector over a split's manifest → mAP + latency.

The reference never ships a working eval (val_AP commented out,
model/DyYOLO.py:163); this implements the SURVEY §6 parity protocol: run
the jitted preproc→forward→decode→NMS pipeline over the val/test split and
compute torchmetrics-compatible mAP (cxcywh, IoU 0.5:0.95, max_det=300).

Usage: python evaluate.py [--split val|test] [--ckpt last|best] [--limit N]
Reads params.yaml for everything else.
"""

import argparse
import json
import time

import numpy as np

from uavdet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", default="val", choices=["val", "test"])
    ap.add_argument("--ckpt", default="last")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dump", default=None,
                    help="write per-image detections (xyxy px + scores) "
                         "to this JSON path — the parity-protocol artifact")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from uavdet_tpu.data import DataPipeline, load_manifest
    from uavdet_tpu.inference import make_detector
    from uavdet_tpu.models import build_model
    from uavdet_tpu.ops.map import MeanAveragePrecision
    from uavdet_tpu.training import CheckpointManager, build_optimizer, \
        init_state
    from uavdet_tpu.utils.config import load_params

    cfg = load_params("params.yaml")
    hparams = cfg.model.hparams
    input_size = int(cfg.dataset.image_size[0])

    model = build_model(cfg.model.name, hparams, dtype=jnp.bfloat16)
    tx = build_optimizer(hparams)
    state = init_state(model, tx, jax.random.key(0), input_size)

    ckpt = CheckpointManager(cfg.train.checkpoint.dir,
                             monitor=cfg.train.checkpoint.monitor,
                             mode=cfg.train.checkpoint.mode)
    name = args.ckpt
    if name == "best" and ckpt.best_path:
        name = ckpt.best_path
    if ckpt.has_checkpoint(name):
        state = ckpt.restore(state, name)
        print(f"Restored checkpoint '{name}'")
    else:
        print(f"WARNING: no checkpoint '{name}', evaluating random init")

    manifest_path = (cfg.dataset.val_loader_path if args.split == "val"
                     else cfg.dataset.test_loader_path)
    records = load_manifest(manifest_path)
    if args.limit:
        records = records[:args.limit]

    pipe = DataPipeline(records, input_size=input_size,
                        batch_size=args.batch, train=False, shuffle=False,
                        drop_last=False,
                        workers=int(cfg.dataset.get("workers", 1) or 1))
    detect = make_detector(model, hparams, input_size)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    metric = MeanAveragePrecision()
    n_img, t_total = 0, 0.0
    dumped = []
    for batch in iter(pipe):
        t0 = time.perf_counter()
        det = detect(variables, batch.image)
        boxes = np.asarray(det.boxes)  # sync
        t_total += time.perf_counter() - t0
        scores = np.asarray(det.scores)
        valid = np.asarray(det.valid)
        gt = np.asarray(batch.boxes) * input_size
        gt_mask = np.asarray(batch.box_mask)
        for i in range(boxes.shape[0]):
            v = valid[i]
            # detections are xyxy pixels; metric consumes cxcywh
            b = boxes[i][v]
            cxcywh = np.stack([(b[:, 0] + b[:, 2]) / 2,
                               (b[:, 1] + b[:, 3]) / 2,
                               b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], -1)
            g = gt[i][gt_mask[i]]
            g_cxcywh = np.stack([(g[:, 0] + g[:, 2]) / 2,
                                 (g[:, 1] + g[:, 3]) / 2,
                                 g[:, 2] - g[:, 0], g[:, 3] - g[:, 1]], -1)
            metric.update(cxcywh, scores[i][v], g_cxcywh)
            if args.dump is not None:
                dumped.append({"boxes_xyxy": b.tolist(),
                               "scores": scores[i][v].tolist(),
                               "gt_xyxy": g.tolist()})
            n_img += 1

    if args.dump is not None:
        with open(args.dump, "w") as f:
            json.dump({"images": dumped}, f)

    out = metric.compute()
    out["images"] = n_img
    out["fps"] = round(n_img / t_total, 1) if t_total else None
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
