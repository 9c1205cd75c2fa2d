#!/usr/bin/env python
"""A/B the parity-folded early stage in the TRAINING step (cfg6 shape:
DyYOLO bs=8 @640 bf16 fwd+bwd).

Inference fold_early won +44 fps at bs=16 (PERF.md r4) by removing the
early section's lane padding at the price of 4x dense FLOPs on B1's
3x3. Whether that trade survives the backward pass (which doubles BOTH
the padding win and the FLOP tax, and adds a fold/unfold transpose pair
the inference path got for free) is not derivable on paper — the padded
costs XLA actually pays are far above byte counts (r3 lesson: only
same-program end-to-end deltas are trustworthy).

Variants (identical tokens after the 128-s2 downsample):
  base     — the stock model
  fold_b1  — fold_nhwc after token1 (64ch @320 -> 256ch @160), B1 +
             downsample with fold_early's block-structured kernels
             (timing proxy: folded-shape params + plain BN on 4C
             channels; the exact quadrant-group BN has the same traffic)

Usage: python scripts/train_fold_probe.py [--batch 8] [--iters 10]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--input", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from uavdet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from uavdet_tpu.models.interpreter import YOLOInterpreter
    from uavdet_tpu.models.layers import CNNBlock, DyConvModule, \
        ResidualBlock
    from uavdet_tpu.ops.fold_early import fold_nhwc
    from uavdet_tpu.utils.config import load_config
    from uavdet_tpu.utils.timing import time_per_iter as _timer

    cfg = load_config("conf", model="dy-yolo")
    LC = tuple(tuple(t) for t in cfg.model.hparams.layer_config)
    DT = jnp.bfloat16
    B, S = args.batch, args.input

    class FoldedB1(nn.Module):
        """B1 + 128-s2 in the folded layout, folded-shape dense params
        (block-structured kernels run dense on the MXU either way, so
        dense params time identically to in-graph folded ones)."""

        @nn.compact
        def __call__(self, x, train):
            xf = fold_nhwc(x)                       # (B,160,160,256)
            y = nn.Conv(128, (1, 1), use_bias=False, dtype=DT)(xf)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=DT)(y)
            y = nn.leaky_relu(y, negative_slope=0.1)
            y = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=DT)(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=DT)(y)
            y = nn.leaky_relu(y, negative_slope=0.1)
            xf = xf + y
            # s2 exit: (2,2,256,128), pad ((1,0),(1,0)) -> @160 x 128
            y = nn.Conv(128, (2, 2), padding=((1, 0), (1, 0)),
                        use_bias=False, dtype=DT)(xf)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=DT)(y)
            return nn.leaky_relu(y, negative_slope=0.1)

    class Probe(nn.Module):
        variant: str

        @nn.compact
        def __call__(self, x, train: bool = True):
            x = x.astype(DT)
            # tokens 0-1: the two DyConv stem tokens (shared)
            x = DyConvModule(32, kernel_size=3, stride=1, padding=1,
                             dtype=DT)(x, 30.0, train)
            x = DyConvModule(64, kernel_size=3, stride=2, padding=1,
                             dtype=DT)(x, 30.0, train)
            if self.variant == "base":
                x = ResidualBlock(64, num_repeats=1, dtype=DT)(x, train)
                x = CNNBlock(128, kernel_size=(3, 3), stride=(2, 2),
                             padding=1, dtype=DT)(x, train)
            else:
                x = FoldedB1()(x, train)
            # the rest of the real config, unchanged
            tail = YOLOInterpreter(layer_config=LC[4:], n_anchors=3,
                                   attn_temperature=30.0, dtype=DT)
            return tail(x, train)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32))

    for variant in ("base", "fold_b1"):
        model = Probe(variant=variant)
        vs = model.init({"params": jax.random.key(0)},
                        jnp.zeros((1, S, S, 3)), train=True)
        params, stats = vs["params"], vs["batch_stats"]

        def loss_fn(p, st, xx):
            outs, mut = model.apply(
                {"params": p, "batch_stats": st}, xx, train=True,
                mutable=["batch_stats"])
            l = sum(jnp.mean(jnp.square(o.obj.astype(jnp.float32)))
                    + jnp.mean(jnp.square(o.bbox.astype(jnp.float32)))
                    for o in outs)
            return l, mut["batch_stats"]

        @jax.jit
        def step(p, st, xx):
            (l, st2), g = jax.value_and_grad(
                loss_fn, has_aux=True)(p, st, xx)
            # SGD-ish touch of every grad leaf so nothing is DCE'd
            # (non-zero lr: XLA would fold 0.0*g away and drop the bwd)
            p2 = jax.tree.map(lambda a, b: a - 1e-12 * b.astype(a.dtype),
                              p, g)
            return p2, st2, l

        state = [params, stats]

        def run():
            p2, st2, l = step(state[0], state[1], x)
            state[0], state[1] = p2, st2
            return l

        dt = _timer(run, lambda l: float(l), iters=args.iters, warmup=3)
        print(f"{variant:<10s} {dt * 1e3:8.2f} ms/step  "
              f"{B / dt:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
