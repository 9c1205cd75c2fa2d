#!/usr/bin/env python
"""Batch inference CLI: image files → detections JSON (+ annotated frames).

Runs the jitted preproc→forward→decode→NMS pipeline (params.yaml model +
orbax checkpoint) over arbitrary image files — the "just detect drones in
these frames" tool neither the reference nor a raw training repo has.
Frames are resized on device (any input resolution); detections are
reported in ORIGINAL-image pixel coordinates.

    python scripts/detect.py --images 'frames/*.jpg' --out dets.json \
        [--ckpt best] [--score 0.25] [--draw annotated/] [--batch 16]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True,
                    help="glob of image files (quote it)")
    ap.add_argument("--out", required=True, help="detections JSON path")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint name ('best'/'last'); default: fresh "
                         "init (pipeline smoke)")
    ap.add_argument("--score", type=float, default=0.25,
                    help="report detections with score >= this")
    ap.add_argument("--draw", default=None,
                    help="directory for annotated copies (cv2 boxes)")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    paths = sorted(glob.glob(args.images))
    if not paths:
        print(f"no files match {args.images!r}", file=sys.stderr)
        return 1
    # Key results by path RELATIVE to the glob root: Anti-UAV-style trees
    # name frames identically across sequence dirs (train/*/visible/000.jpg),
    # so basename keys would silently collide and drop detections.
    root = os.path.commonpath(paths) if len(paths) > 1 else os.path.dirname(paths[0])
    if os.path.isfile(root):
        root = os.path.dirname(root)
    rel = {p: os.path.relpath(p, root) for p in paths}

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from uavdet_tpu.inference import make_detector
    from uavdet_tpu.models import build_model
    from uavdet_tpu.utils.config import load_params

    cfg = load_params("params.yaml")
    hparams = cfg.model.hparams
    input_size = int(cfg.dataset.image_size[0])
    model = build_model(cfg.model.name, hparams, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, input_size, input_size, 3), jnp.float32),
        train=False)
    if args.ckpt:
        from uavdet_tpu.training.checkpoint import CheckpointManager
        from uavdet_tpu.training.optim import build_optimizer
        from uavdet_tpu.training.steps import init_state
        ck = cfg.train.checkpoint
        mgr = CheckpointManager(ck.dir, monitor=ck.monitor, mode=ck.mode)
        state = mgr.restore(
            init_state(model, build_optimizer(hparams), jax.random.key(0),
                       input_size), args.ckpt)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    detect = make_detector(model, hparams, input_size,
                           pallas_stem_variables=variables,
                           score_threshold=args.score)

    results = {}
    bs = args.batch
    for c0 in range(0, len(paths), bs):
        chunk = paths[c0:c0 + bs]
        frames, sizes = [], []
        for p in chunk:
            with Image.open(p) as im:
                arr = np.asarray(im.convert("RGB"))
            sizes.append(arr.shape[:2])
            # BILINEAR matches the on-device bilinear (separable-matmul) resize
            # in preprocess(), keeping serving numerics aligned.
            frames.append(np.asarray(
                Image.fromarray(arr).resize((input_size, input_size),
                                            Image.BILINEAR)))
        # pad the tail chunk to the compiled batch size
        n = len(frames)
        while len(frames) < bs:
            frames.append(np.zeros_like(frames[0]))
        dets = detect(variables, jnp.asarray(np.stack(frames)))
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        valid = np.asarray(dets.valid)
        for i in range(n):
            h0, w0 = sizes[i]
            sx, sy = w0 / input_size, h0 / input_size
            keep = valid[i] & (scores[i] >= args.score)
            bx = boxes[i][keep] * np.asarray([sx, sy, sx, sy])
            results[rel[chunk[i]]] = {
                "boxes_xyxy": np.round(bx, 2).tolist(),
                "scores": np.round(scores[i][keep], 4).tolist(),
            }
            if args.draw:
                from uavdet_tpu.utils.viz import draw_bbox
                out_path = os.path.join(args.draw, rel[chunk[i]])
                os.makedirs(os.path.dirname(out_path) or args.draw,
                            exist_ok=True)
                with Image.open(chunk[i]) as im:
                    # .copy(): PIL-backed arrays are readonly; cv2 draws
                    # in place
                    img = np.asarray(im.convert("RGB")).copy()
                for b, s in zip(bx, scores[i][keep]):
                    img = draw_bbox(img, b, label=f"uav {s:.2f}")
                Image.fromarray(img).save(out_path)
        print(f"{min(c0 + bs, len(paths))}/{len(paths)} frames")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    n_det = sum(len(v["scores"]) for v in results.values())
    print(f"wrote {args.out}: {n_det} detections over {len(results)} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
