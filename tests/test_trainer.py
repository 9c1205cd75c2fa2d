"""Trainer orchestration tests (in-process, synthetic data, tiny model)."""

import os

import numpy as np
import pytest

from uavdet_tpu.data import DataPipeline, build_index, make_synthetic_dataset
from uavdet_tpu.training import MetricsWriter, Trainer
from uavdet_tpu.utils.config import Config
from tests.test_entry_points import TINY


def _config(tmp_path, **trainer_overrides):
    trainer = {
        "epochs": 1, "input_size": [3, 64, 64], "profiler": None,
        "grad_batches": 1, "train_batches": 2, "val_batches": 1,
        "val_check_interval": 1.0, "accelerator": "cpu", "devices": 1,
        "precision": 32, "grad_clip_val": None}
    trainer.update(trainer_overrides)
    return Config({
        "dataset": {"root_dir": "x", "batch_size": 2, "remote": False,
                    "image_size": [64, 64], "workers": 1, "mosaic": False,
                    "format": "yolo"},
        "train": {"seed": 211, "trainer": trainer,
                  "checkpoint": {"dir": str(tmp_path / "ck"),
                                 "monitor": "val_loss", "mode": "min"}},
        "model": {"name": "DyYOLO", "hparams": {
            "anchors": [[[40, 30], [60, 46], [54, 36]],
                        [[18, 14], [24, 18], [30, 12]],
                        [[6, 5], [10, 6], [13, 8]]],
            "head_scales": [16, 8, 4], "lr": 0.001, "lr_scheduler": False,
            "loss_balancing": {"obj_scales_w": [0.5, 1.0, 2.0],
                               "bbox_w": 4.0, "objectness_w": 1.0,
                               "no_obj_w": 4.0},
            "bbox_loss_fn": "mse", "attn_temperature": 30.0,
            "optim": {"name": "SGD", "momentum": 0.78},
            "layer_config": TINY}}})


@pytest.fixture(scope="module")
def pipes(tmp_path_factory):
    root = make_synthetic_dataset(
        str(tmp_path_factory.mktemp("ds")), n_seq=1, n_frames=5,
        img_size=96)
    tr = DataPipeline(build_index(os.path.join(root, "train")), 64, 2,
                      train=True, seed=1)
    va = DataPipeline(build_index(os.path.join(root, "val")), 64, 2,
                      train=False, seed=1)
    return tr, va


def test_trainer_fit_with_val_ap(pipes, tmp_path):
    tr, va = pipes
    cfg = _config(tmp_path, eval_ap=True)
    t = Trainer(cfg, tr, va, metrics=MetricsWriter(str(tmp_path / "dv")))
    final = t.fit()
    assert np.isfinite(final["val_loss"])
    assert "val_AP" in final and final["val_AP"] >= 0.0
    assert os.path.exists(tmp_path / "dv" / "metrics.json")
    assert os.path.exists(
        tmp_path / "dv" / "plots" / "metrics" / "val" / "AP.tsv")
    assert t.ckpt.has_checkpoint("last")


def test_trainer_resume(pipes, tmp_path):
    tr, va = pipes
    cfg = _config(tmp_path)
    t = Trainer(cfg, tr, va, metrics=MetricsWriter(str(tmp_path / "dv2")))
    t.fit()
    # resume should restore without error and continue from saved step
    t2 = Trainer(cfg, tr, va, metrics=MetricsWriter(str(tmp_path / "dv3")))
    final = t2.fit(resume=True)
    assert np.isfinite(final["val_loss"])


def test_trainer_mesh_config_surface(pipes, tmp_path):
    """train.trainer.devices=8 with fsdp_devices=2 builds the 4×2
    data×fsdp mesh and fit() runs sharded end-to-end; a non-factorizable
    combination raises; a batch that doesn't divide the ZeRO batch group
    (data×fsdp×ep) raises; the unsupported fsdp×sp combination raises."""
    tr, va = pipes
    cfg = _config(tmp_path, devices=2, fsdp_devices=2)
    t = Trainer(cfg, tr, va, metrics=MetricsWriter(str(tmp_path / "dvm")))
    assert dict(t.mesh.shape) == {"data": 1, "fsdp": 2, "sp": 1, "ep": 1}
    final = t.fit()
    assert np.isfinite(final["val_loss"])

    with pytest.raises(ValueError, match="not divisible"):
        Trainer(_config(tmp_path, devices=8, sp_devices=3), tr, va,
                metrics=MetricsWriter(str(tmp_path / "dvm2")))

    # batch_size=2 can't shard over data*fsdp*ep = 8
    with pytest.raises(ValueError, match="batch_size"):
        Trainer(_config(tmp_path, devices=8, fsdp_devices=4), tr, va,
                metrics=MetricsWriter(str(tmp_path / "dvm2b")))

    # fsdp param sharding × spatial partitioning: measured XLA GSPMD
    # miscompilation (scripts/gspmd_fsdp_sp_repro.py) — rejected loudly
    with pytest.raises(ValueError, match="GSPMD"):
        Trainer(_config(tmp_path, devices=8, fsdp_devices=2, sp_devices=2),
                tr, va, metrics=MetricsWriter(str(tmp_path / "dvm2c")))

    cfg_ep = _config(tmp_path, devices=8, sp_devices=4, ep_devices=2)
    t_ep = Trainer(cfg_ep, tr, va,
                   metrics=MetricsWriter(str(tmp_path / "dvm3")))
    assert dict(t_ep.mesh.shape) == {"data": 1, "fsdp": 1, "sp": 4, "ep": 2}
    final_ep = t_ep.fit()
    assert np.isfinite(final_ep["val_loss"])


def test_check_val_every_n_epoch(pipes, tmp_path):
    """With check_val_every_n_epoch=2 and 3 epochs, validation runs only
    in epoch 1 (0-indexed) — Lightning semantics (reference train.py:55)."""
    tr, va = pipes
    cfg = _config(tmp_path, epochs=3, check_val_every_n_epoch=2)
    t = Trainer(cfg, tr, va, metrics=MetricsWriter(str(tmp_path / "dvv")))
    calls = []
    orig = t.validate
    t.validate = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    final = t.fit()
    # 2 train batches/epoch, val_check_interval=1.0 → 1 val call per
    # eligible epoch; only epoch index 1 is eligible out of 3
    assert len(calls) == 1
    assert np.isfinite(final["val_loss"])


def test_validate_reuses_detector(pipes, tmp_path):
    """eval_ap validation must reuse ONE jitted detector across passes
    (a fresh jit closure per epoch would retrace every time; ADVICE r1)."""
    tr, va = pipes
    cfg = _config(tmp_path, epochs=2, eval_ap=True)
    t = Trainer(cfg, tr, va, metrics=MetricsWriter(str(tmp_path / "dvd")))
    seen = []
    orig_validate = t.validate

    def spy(state, eval_step):
        out = orig_validate(state, eval_step)
        seen.append(t._detector)
        return out

    t.validate = spy
    t.fit()
    assert len(seen) >= 2
    assert all(d is seen[0] for d in seen), "detector rebuilt per pass"


def test_epoch_interval_lr_schedule():
    """build_optimizer(steps_per_epoch=N) holds the cyclic schedule at the
    epoch index t//N (the reference's Lightning steps CyclicLR per EPOCH;
    optim.py deviation note)."""
    import jax.numpy as jnp
    from uavdet_tpu.training.optim import build_optimizer, \
        cyclic_triangular2

    class HP:
        lr = 0.1
        lr_scheduler = True

        class optim:
            name = "SGD"
            momentum = 0.0  # update == -lr(step) · grad exactly

    def observed_lrs(tx, n):
        params = {"w": jnp.ones(())}
        st = tx.init(params)
        g = {"w": jnp.ones(())}
        lrs = []
        for _ in range(n):
            u, st = tx.update(g, st, params)
            lrs.append(-float(u["w"]))
        return lrs

    inner = cyclic_triangular2(0.01, 0.1)
    per_step = observed_lrs(build_optimizer(HP), 4)
    per_epoch = observed_lrs(build_optimizer(HP, steps_per_epoch=2), 4)
    np.testing.assert_allclose(
        per_step, [float(inner(t)) for t in range(4)], rtol=1e-6)
    np.testing.assert_allclose(
        per_epoch, [float(inner(t // 2)) for t in range(4)], rtol=1e-6)
    assert per_step[2] != per_epoch[2]  # the modes genuinely differ


def test_metric_fetches_are_batched(pipes, tmp_path):
    """The step loop must NOT sync the host per step (each fetch is a
    roundtrip on the tunneled platform; VERDICT r2 weak #4): with
    log_every_n_steps > n_train there are exactly 2 host syncs per epoch
    — one draining all step metrics at the val boundary, one batched
    fetch inside validate()."""
    import json
    tr, va = pipes
    cfg = _config(tmp_path, train_batches=4, log_every_n_steps=100)
    t = Trainer(cfg, tr, va, metrics=MetricsWriter(str(tmp_path / "dvs")))
    final = t.fit()
    assert t._n_metric_syncs == 2, t._n_metric_syncs
    assert np.isfinite(final["val_loss"])
    # every step metric still logged, in order
    tsv = (tmp_path / "dvs" / "plots" / "metrics" / "train"
           / "loss.tsv").read_text().strip().splitlines()
    assert len(tsv) == 1 + 4  # header + 4 steps
    assert [int(r.split("\t")[0]) for r in tsv[1:]] == [0, 1, 2, 3]
    # metrics.json carries the reference's top-level epoch key
    # (reference dvclive/metrics.json:7)
    mj = json.loads((tmp_path / "dvs" / "metrics.json").read_text())
    assert mj["epoch"] == 0 and "step" in mj


def test_nan_guard_skips_poisoned_batches(pipes, tmp_path):
    """Inject a NaN image batch; the guard must skip it and finish."""
    import numpy as np
    tr, va = pipes
    cfg = _config(tmp_path / "ng", nan_guard=True, train_batches=3)

    class PoisonPipe:
        def __init__(self, inner):
            self.inner = inner

        def __len__(self):
            return len(self.inner)

        def __iter__(self):
            for i, b in enumerate(iter(self.inner)):
                if i == 1:  # poison the 2nd batch
                    yield b._replace(image=np.full_like(
                        np.asarray(b.image), np.nan))
                else:
                    yield b

    t = Trainer(cfg, PoisonPipe(tr), va,
                metrics=MetricsWriter(str(tmp_path / "ng" / "dv")))
    final = t.fit()
    assert np.isfinite(final["val_loss"])


def test_trainer_pp_config_surface(pipes, tmp_path):
    """train.trainer.pp_devices=2 runs Trainer.fit with collective
    pipelining: packed one-stage-per-device state over the ('pp',) mesh
    (parallel.pipeline), val loss + AP via the unpacked flagship
    variables, checkpoint save + resume in the packed form. Invalid
    combinations raise at construction."""
    tr, va = pipes
    cfg = _config(tmp_path, devices=2, pp_devices=2, eval_ap=True)
    t = Trainer(cfg, tr, va, metrics=MetricsWriter(str(tmp_path / "dvp")))
    assert dict(t.pp_mesh.shape) == {"pp": 2}
    assert t.mesh is None  # pp runs on its OWN mesh
    final = t.fit()
    assert np.isfinite(final["val_loss"])
    assert "val_AP" in final and final["val_AP"] >= 0.0
    assert t.ckpt.has_checkpoint("last")

    # resume restores the packed pp state and continues
    t2 = Trainer(cfg, tr, va, metrics=MetricsWriter(str(tmp_path / "dvp2")))
    final2 = t2.fit(resume=True)
    assert np.isfinite(final2["val_loss"])

    # pp is mutually exclusive with the 4-axis mesh
    with pytest.raises(ValueError, match="cannot combine"):
        Trainer(_config(tmp_path, devices=4, pp_devices=2, fsdp_devices=2),
                tr, va, metrics=MetricsWriter(str(tmp_path / "dvp3")))

    # batch_size=2 cannot split into 3 microbatches
    with pytest.raises(ValueError, match="pp_microbatches"):
        Trainer(_config(tmp_path, devices=2, pp_devices=2,
                        pp_microbatches=3),
                tr, va, metrics=MetricsWriter(str(tmp_path / "dvp4")))

    # devices, when given, must equal pp_devices
    with pytest.raises(ValueError, match="must equal"):
        Trainer(_config(tmp_path, devices=4, pp_devices=2), tr, va,
                metrics=MetricsWriter(str(tmp_path / "dvp5")))


def test_trainer_fold_early_config_surface(pipes, tmp_path, monkeypatch):
    """train.trainer.fold_early: true reaches make_train_step and the
    folded early stage actually builds (the TINY config matches the
    [B,1]+[C,3,2] gate); fit converges to a finite loss. Step-level
    numerics parity lives in tests/test_fold_train.py."""
    from uavdet_tpu.ops import fold_early as fe
    calls = []
    real = fe.fold_early_train_apply

    def spy(model):
        fn = real(model)
        calls.append(fn is not None)
        return fn

    monkeypatch.setattr(fe, "fold_early_train_apply", spy)
    tr, va = pipes
    cfg = _config(tmp_path, fold_early=True)
    t = Trainer(cfg, tr, va, metrics=MetricsWriter(str(tmp_path / "dvf")))
    assert t.fold_early is True
    final = t.fit()
    assert calls == [True]  # built once, config matched the gate
    assert np.isfinite(final["val_loss"])
