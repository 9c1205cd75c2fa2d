"""Unit tests: config composer, DVCLive writer, checkpoint manager."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from uavdet_tpu.training.checkpoint import CheckpointManager
from uavdet_tpu.training.dvclive_io import MetricsWriter
from uavdet_tpu.utils.config import load_config, load_params, save_params
from uavdet_tpu.utils.datatypes import TrainState

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_conf_tree_composes_to_params():
    cfg = load_config(os.path.join(REPO, "conf"))
    assert cfg.model.name == "DyYOLO"
    assert cfg.model.hparams.bbox_loss_fn == "mse"
    assert cfg.dataset.batch_size == 4
    assert cfg.train.trainer.grad_batches == 2
    # model override
    cfg2 = load_config(os.path.join(REPO, "conf"), model="baseline")
    assert cfg2.model.name == "baseline"
    assert cfg2.model.hparams.bbox_loss_fn == "ciou"


def test_params_yaml_matches_conf():
    cfg = load_config(os.path.join(REPO, "conf"))
    params = load_params(os.path.join(REPO, "params.yaml"))
    assert cfg.to_dict() == params.to_dict()


def test_config_roundtrip(tmp_path):
    cfg = load_config(os.path.join(REPO, "conf"))
    p = str(tmp_path / "p.yaml")
    save_params(cfg, p)
    assert load_params(p).to_dict() == cfg.to_dict()


def test_config_attribute_errors():
    cfg = load_params(os.path.join(REPO, "params.yaml"))
    with pytest.raises(AttributeError):
        _ = cfg.nonexistent_key
    assert cfg.train.get("nope", 5) == 5
    assert "dataset" in cfg


def test_metrics_writer_contract(tmp_path):
    w = MetricsWriter(str(tmp_path / "dvclive"))
    for step in range(3):
        w.log("train/loss", 1.0 / (step + 1))
        w.log("train/bbox_loss", 0.5)
        w.next_step()
    w.log("val/loss", 0.7)
    w.flush()

    m = json.loads((tmp_path / "dvclive" / "metrics.json").read_text())
    assert m["train"]["loss"] == pytest.approx(1 / 3)
    assert m["val"]["loss"] == 0.7
    tsv = (tmp_path / "dvclive" / "plots" / "metrics" / "train" /
           "loss.tsv").read_text().splitlines()
    assert tsv[0] == "step\tloss"
    assert len(tsv) == 4


def _tiny_state(value):
    return TrainState(params={"w": np.full((4, 4), value, np.float32)},
                      batch_stats={"m": np.zeros((4,), np.float32)},
                      opt_state={"v": np.ones((4, 4), np.float32)},
                      step=jnp.asarray(3))


def test_checkpoint_best_last_policy(tmp_path):
    cm = CheckpointManager(str(tmp_path / "ck"), monitor="val_loss",
                           mode="min")
    assert cm.save(_tiny_state(1.0), 0, {"val_loss": 2.0})  # first → best
    assert not cm.save(_tiny_state(2.0), 1, {"val_loss": 3.0})  # worse
    assert cm.save(_tiny_state(3.0), 2, {"val_loss": 1.0})  # better

    names = os.listdir(tmp_path / "ck")
    assert "last" in names
    bests = [n for n in names if n.startswith("best-")]
    assert bests == ["best-02-1.0000"]  # old best removed

    like = _tiny_state(0.0)
    last = cm.restore(like, "last")
    np.testing.assert_array_equal(np.asarray(last.params["w"]),
                                  np.full((4, 4), 3.0))
    best = cm.restore(like, "best-02-1.0000")
    np.testing.assert_array_equal(np.asarray(best.params["w"]),
                                  np.full((4, 4), 3.0))


def test_checkpoint_meta_persists(tmp_path):
    cm = CheckpointManager(str(tmp_path / "ck"))
    cm.save(_tiny_state(1.0), 0, {"val_loss": 2.0})
    cm2 = CheckpointManager(str(tmp_path / "ck"))  # reload meta
    assert cm2.best_value == 2.0
    assert cm2.best_path == "best-00-2.0000"


def test_summarize_model():
    from uavdet_tpu.models import DyYOLO
    from uavdet_tpu.utils.viz import summarize_model
    from tests.test_models import TINY_DY_CONFIG
    table = summarize_model(DyYOLO(layer_config=TINY_DY_CONFIG),
                            input_shape=(1, 64, 64, 3))
    # rich truncates long module names; check the stable bits
    assert "DyYOLO Summary" in table
    assert "params" in table and "batch_sta" in table
