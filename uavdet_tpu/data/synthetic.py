"""Synthetic Anti-UAV-RGBT mini-tree generator for tests and smoke runs.

Writes the exact directory layout the index builder scans
(reference dataset/AntiUAVDataset.py:107-123): per-sequence visible/infrared
frame dirs + gt JSONs + label_new attributes. Frames contain a bright
rectangle at the GT box so a trained detector has signal.
"""

import json
import os

import numpy as np


def make_synthetic_dataset(root: str, splits=("train", "val", "test"),
                           n_seq: int = 2, n_frames: int = 6,
                           img_size: int = 160, seed: int = 0) -> str:
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "label_new"), exist_ok=True)

    for split in splits:
        for s in range(n_seq):
            seq = f"{split}_seq{s:02d}"
            seq_dir = os.path.join(root, split, seq)
            with open(os.path.join(root, "label_new", f"{seq}.json"),
                      "w") as f:
                json.dump({"TS": "small", "LR": 1}, f)

            for cam in ("visible", "infrared"):
                cam_dir = os.path.join(seq_dir, cam)
                os.makedirs(cam_dir, exist_ok=True)
                gt_rect, exist = [], []
                for i in range(n_frames):
                    present = int(rng.uniform() > 0.2)
                    w = int(rng.integers(12, img_size // 3))
                    h = int(rng.integers(12, img_size // 3))
                    x = int(rng.integers(0, img_size - w))
                    y = int(rng.integers(0, img_size - h))
                    gt_rect.append([x, y, w, h] if present else [0, 0, 0, 0])
                    exist.append(present)

                    img = rng.integers(
                        0, 80, size=(img_size, img_size, 3),
                        dtype=np.uint8)
                    if present:
                        img[y:y + h, x:x + w] = (
                            np.asarray([255, 240, 220], np.uint8)
                            if cam == "visible"
                            else np.asarray([250, 250, 250], np.uint8))
                    Image.fromarray(img).save(
                        os.path.join(cam_dir, f"{cam}-{str(i).zfill(4)}.jpg"))

                with open(os.path.join(seq_dir, f"{cam}.json"), "w") as f:
                    json.dump({"gt_rect": gt_rect, "exist": exist}, f)
    return root
