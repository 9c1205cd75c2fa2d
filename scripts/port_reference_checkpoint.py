#!/usr/bin/env python
"""Port a reference Lightning .ckpt to an orbax checkpoint loadable by this
framework.

Usage:
    python scripts/port_reference_checkpoint.py <ref.ckpt> <out_dir> \
        [--params params.yaml]

Maps the torch state_dict onto our flax trees (see
uavdet_tpu/utils/torch_import.py) and saves {params, batch_stats} so
evaluate.py / the Trainer can restore it for parity runs.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--params", default="params.yaml")
    args = ap.parse_args()

    import jax
    import numpy as np
    from uavdet_tpu.models import build_model
    from uavdet_tpu.training import CheckpointManager, build_optimizer, \
        init_state
    from uavdet_tpu.utils.config import load_params
    from uavdet_tpu.utils.datatypes import TrainState
    from uavdet_tpu.utils.torch_import import load_lightning_checkpoint

    cfg = load_params(args.params)
    hparams = cfg.model.hparams
    params, stats = load_lightning_checkpoint(
        args.ckpt, hparams.layer_config)

    # sanity: structure must match a fresh init
    model = build_model(cfg.model.name, hparams)
    tx = build_optimizer(hparams)
    ref = init_state(model, tx, jax.random.key(0),
                     int(cfg.dataset.image_size[0]))
    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(ref.params)}
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    missing = ref_paths - got_paths
    if missing:
        raise SystemExit(f"import incomplete; missing: {sorted(missing)[:5]}")

    state = TrainState(params=params, batch_stats=stats,
                       opt_state=ref.opt_state, step=ref.step)
    out_dir = os.path.abspath(args.out_dir)  # orbax requires absolute paths
    cm = CheckpointManager(out_dir)
    cm._save(state, os.path.join(out_dir, "last"))
    n = sum(np.asarray(v).size for v in jax.tree_util.tree_leaves(params))
    print(f"ported {n/1e6:.1f}M params -> {args.out_dir}/last")


if __name__ == "__main__":
    main()
