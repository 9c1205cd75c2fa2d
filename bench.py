#!/usr/bin/env python
"""End-to-end benchmark: preproc → DyYOLO forward → decode → NMS at 640px.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

North star (BASELINE.md): ≥2,000 fps/chip end-to-end on TPU v5e at 640px.
``vs_baseline`` is fps / 2000.

Usage: python bench.py [--batch N] [--iters N] [--smoke] [--model NAME]
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--input", type=int, default=640)
    ap.add_argument("--model", default=None,
                    help="model name override (default: params.yaml)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes for a fast CI smoke run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from uavdet_tpu.models import build_model
    from uavdet_tpu.inference import make_detector
    from uavdet_tpu.utils.config import load_params

    cfg = load_params("params.yaml")
    hparams = cfg.model.hparams
    name = args.model or cfg.model.name
    input_size = 64 if args.smoke else args.input
    batch = 2 if args.smoke else args.batch

    if args.smoke:
        # shrink the net: keep every token type but few channels
        hparams.layer_config = [
            ["DyConv", 8, 3, 1], [16, 3, 2], ["B", 1], [32, 3, 2], ["B", 8],
            [64, 3, 2], ["B", 8], [128, 3, 2], ["B", 1], [64, 1, 1],
            [128, 3, 1], ["S"], [32, 1, 1], ["U"], [32, 1, 1], [64, 3, 1],
            ["S"], [16, 1, 1], ["U"], [16, 1, 1], [32, 3, 1], ["S"]]

    model = build_model(name, hparams, dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    x_init = jnp.zeros((batch, input_size, input_size, 3), jnp.float32)
    variables = model.init(rng, x_init, train=False)

    detect = make_detector(model, hparams, input_size,
                           pre_nms_topk=256 if args.smoke else 512)

    imgs = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 256, size=(batch, input_size, input_size, 3), dtype=np.uint8))

    # compile + warmup. NOTE: on the tunneled 'axon' platform
    # block_until_ready returns before device execution completes, so the
    # only reliable sync is fetching a value to the host.
    def sync(out):
        return float(jnp.sum(out.scores))

    sync(detect(variables, imgs))
    for _ in range(args.warmup):
        sync(detect(variables, imgs))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = detect(variables, imgs)
    sync(out)  # device executes in order; last result syncs them all
    dt = time.perf_counter() - t0

    fps = batch * args.iters / dt
    result = {
        "metric": f"fps/chip end-to-end (preproc+detect+NMS) "
                  f"{name} @ {input_size}px bs={batch}",
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": round(fps / 2000.0, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
