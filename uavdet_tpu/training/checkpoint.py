"""Checkpointing — best/last policy on val_loss via Orbax.

Reference: Lightning ModelCheckpoint with filename
``best-{epoch:02d}-{val_loss:.4f}``, dirpath=logs/checkpoints,
monitor=val_loss, mode=min, save_last=True (reference train.py:32-38).
Resume is wired (the reference writes last.ckpt but never resumes —
SURVEY §5); ``restore_last`` restores params/batch_stats/opt_state/step.
"""

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

from ..utils.datatypes import TrainState


class CheckpointManager:
    def __init__(self, ckpt_dir: str, monitor: str = "val_loss",
                 mode: str = "min"):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.best_value: Optional[float] = None
        self.best_path: Optional[str] = None
        self._meta_path = os.path.join(self.ckpt_dir, "meta.json")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
            self.best_value = meta.get("best_value")
            self.best_path = meta.get("best_path")

    def _is_better(self, value: float) -> bool:
        if self.best_value is None:
            return True
        return (value < self.best_value if self.mode == "min"
                else value > self.best_value)

    def _save(self, state: TrainState, path: str):
        if _HAS_ORBAX and jax.process_count() > 1:
            # multi-host: Orbax writes each host's addressable shards
            # natively; a numpy gather would touch non-addressable ones
            from jax.experimental import multihost_utils
            if jax.process_index() == 0 and os.path.exists(path):
                shutil.rmtree(path)
            multihost_utils.sync_global_devices("uavdet_ckpt_rm")
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, state)
            ckptr.wait_until_finished()
            return
        state = jax.tree.map(np.asarray, state)
        if os.path.exists(path):
            shutil.rmtree(path)
        if _HAS_ORBAX:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, state)
            ckptr.wait_until_finished()
        else:  # flat-numpy fallback
            os.makedirs(path)
            flat, treedef = jax.tree.flatten(state)
            np.savez(os.path.join(path, "arrays.npz"),
                     **{str(i): a for i, a in enumerate(flat)})

    def save(self, state: TrainState, epoch: int, metrics: dict):
        """Save last + (conditionally) best; returns True if new best."""
        self._save(state, os.path.join(self.ckpt_dir, "last"))
        value = float(metrics[self.monitor])
        is_best = self._is_better(value)
        if is_best:
            name = f"best-{epoch:02d}-{value:.4f}"
            if self.best_path:
                old = os.path.join(self.ckpt_dir, self.best_path)
                # one deleter on shared filesystems (every process keeps
                # the bookkeeping; _save coordinates its own writes)
                if jax.process_index() == 0 and os.path.exists(old):
                    shutil.rmtree(old)
            self._save(state, os.path.join(self.ckpt_dir, name))
            self.best_value, self.best_path = value, name
        if jax.process_index() == 0:
            with open(self._meta_path, "w") as f:
                json.dump({"best_value": self.best_value,
                           "best_path": self.best_path, "epoch": epoch}, f)
        return is_best

    def restore(self, like: TrainState, name: str = "last") -> TrainState:
        path = os.path.join(self.ckpt_dir, name)
        if _HAS_ORBAX:
            ckptr = ocp.StandardCheckpointer()
            # shape/dtype template only — np.asarray would fail on a
            # multi-process state (non-addressable shards); every process
            # reads the full arrays from the (shared) checkpoint dir
            def _np_like(x):
                if isinstance(x, jax.Array) and not x.is_fully_addressable:
                    return np.zeros(x.shape, x.dtype)
                return np.asarray(x)
            return ckptr.restore(path, jax.tree.map(_np_like, like))
        flat, treedef = jax.tree.flatten(like)
        data = np.load(os.path.join(path, "arrays.npz"))
        return jax.tree.unflatten(
            treedef, [data[str(i)] for i in range(len(flat))])

    def has_checkpoint(self, name: str = "last") -> bool:
        return os.path.exists(os.path.join(self.ckpt_dir, name))
