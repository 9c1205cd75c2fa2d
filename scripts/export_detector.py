#!/usr/bin/env python
"""AOT-export the params.yaml detector to a serving artifact.

Builds the model from params.yaml, loads a checkpoint (orbax best/last via
training.checkpoint, same policy train.py writes), and serializes the full
preproc→forward→decode→NMS program with jax.export. The artifact is
self-contained (weights baked in) and platform-specific.

    python scripts/export_detector.py --out detector.bin [--ckpt best]
        [--batch 16] [--dual] [--platform tpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint name ('best'/'last'); default: fresh "
                    "init (smoke exports)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dual", action="store_true",
                    help="native-res RGB+IR dual-stream entry")
    ap.add_argument("--platform", default=None,
                    help="lowering platform (default: current backend)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from uavdet_tpu.export import export_detector
    from uavdet_tpu.models import build_model
    from uavdet_tpu.utils.config import load_params

    cfg = load_params("params.yaml")
    hparams = cfg.model.hparams
    input_size = int(cfg.dataset.image_size[0])
    model = build_model(cfg.model.name, hparams, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)

    if args.ckpt:
        from uavdet_tpu.training.checkpoint import CheckpointManager
        from uavdet_tpu.training.optim import build_optimizer
        from uavdet_tpu.training.steps import init_state
        ck = cfg.train.checkpoint
        mgr = CheckpointManager(ck.dir, monitor=ck.monitor, mode=ck.mode)
        state = init_state(model, build_optimizer(hparams),
                           jax.random.key(0), input_size)
        state = mgr.restore(state, args.ckpt)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    blob = export_detector(
        model, hparams, variables, input_size, args.batch, dual=args.dual,
        platforms=[args.platform] if args.platform else None)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB, "
          f"batch={args.batch}, dual={args.dual})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
