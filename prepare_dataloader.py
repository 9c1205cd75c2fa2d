#!/usr/bin/env python
"""Stage 1: build dataset manifests (reference prepare_dataloader.py).

Reads params.yaml (no CLI args, same contract as the reference), scans the
Anti-UAV-RGBT tree for the train/val/test splits and writes a serialized
index manifest per split — replacing the reference's joblib-pickled
DataLoader artifacts (reference prepare_dataloader.py:67-69) with small
JSON files; the heavy work (decode/augment/encode) happens at train time
on the host pipeline + device.
"""

import os

from uavdet_tpu.data import build_index, save_manifest
from uavdet_tpu.data.remote import make_filesystem
from uavdet_tpu.utils.config import load_params
from uavdet_tpu.utils.seeding import seed_everything


def main():
    config = load_params("params.yaml")
    seed = int(config.train.seed or 11)
    seed_everything(seed)

    ds = config.dataset
    fs = make_filesystem(ds.root_dir, bool(ds.remote))

    for split, out_path in (("train", ds.train_loader_path),
                            ("val", ds.val_loader_path),
                            ("test", ds.test_loader_path)):
        records = build_index(os.path.join(ds.root_dir, split),
                              seed=seed, fs=fs)
        save_manifest(records, out_path)
        print(f"Created {split} manifest ({len(records)} frames) "
              f"-> {out_path}")


if __name__ == "__main__":
    main()
