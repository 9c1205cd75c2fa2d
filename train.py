#!/usr/bin/env python
"""Stage 2: train (reference train.py).

Reads params.yaml (no CLI args), loads the stage-1 manifests, dispatches the
model by ``model.name``, trains with the configured trainer settings, writes
DVCLive-format metrics (dvclive/metrics.json + plots tsv) and best/last
checkpoints under train.checkpoint.dir.
"""

import numpy as np

from uavdet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from uavdet_tpu.data import DataPipeline, load_manifest
from uavdet_tpu.data.remote import make_filesystem
from uavdet_tpu.training import MetricsWriter, Trainer
from uavdet_tpu.utils.config import load_params
from uavdet_tpu.utils.seeding import seed_everything


def train(config, train_pipe, val_pipe, resume: bool = False):
    trainer = Trainer(config, train_pipe, val_pipe,
                      metrics=MetricsWriter("dvclive"))
    final = trainer.fit(resume=resume)
    print({k: round(v, 5) if isinstance(v, float) else v
           for k, v in final.items()})
    return final


def main():
    import sys
    resume = "--resume" in sys.argv  # resume from last.ckpt (the reference
    # writes last but never resumes, SURVEY §5 — wired here)
    config = load_params("params.yaml")
    if config.train.seed:
        seed_everything(int(config.train.seed))

    ds = config.dataset
    fs = make_filesystem(ds.root_dir, bool(ds.remote))
    input_size = int(ds.image_size[0])
    seed = int(config.train.seed or 11)

    workers = int(ds.get("workers", 1) or 1)
    fmt = str(ds.get("format", "yolo"))
    train_pipe = DataPipeline(
        load_manifest(ds.train_loader_path), input_size=input_size,
        batch_size=int(ds.batch_size), train=True, seed=seed,
        mosaic=bool(ds.mosaic), fs=fs, workers=workers, fmt=fmt)
    print("Train manifest loaded...")
    val_pipe = DataPipeline(
        load_manifest(ds.val_loader_path), input_size=input_size,
        batch_size=int(ds.batch_size), train=False, seed=seed, fs=fs,
        workers=workers, fmt=fmt)
    print("Validation manifest loaded...")

    train(config, train_pipe, val_pipe, resume=resume)


if __name__ == "__main__":
    main()
