"""Multi-host runtime tests (parallel/multihost.py).

The real thing, not a mock: a 2-process jax.distributed cluster on
localhost (gRPC DCN), each process owning 2 virtual CPU devices → a
global 4-device mesh. Each worker runs one sharded train step on the
same deterministic batch and prints its loss + a param fingerprint; the
test asserts (a) both processes agree bitwise and (b) they match the
single-device step computed in-process.

Single-process degradation (shard_host_batch == shard_batch) is covered
in-process.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uavdet_tpu.models import DyYOLO
from uavdet_tpu.parallel import make_mesh, make_sharded_train_step, \
    shard_host_batch
from uavdet_tpu.parallel.mesh import state_shardings
from uavdet_tpu.training import build_optimizer, init_state, make_train_step
from tests.test_models import TINY_DY_CONFIG
from tests.test_train_step import HP, INPUT, _synthetic_batch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
from uavdet_tpu.parallel import init_multihost
coord, pid = sys.argv[1], int(sys.argv[2])
init_multihost(coordinator=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

import numpy as np
import jax.numpy as jnp
from uavdet_tpu.models import DyYOLO
from uavdet_tpu.parallel import (make_mesh, make_sharded_train_step,
                                 shard_host_batch)
from uavdet_tpu.parallel.mesh import state_shardings
from uavdet_tpu.training import build_optimizer, init_state
from tests.test_models import TINY_DY_CONFIG
from tests.test_train_step import HP, INPUT, _synthetic_batch

model = DyYOLO(layer_config=TINY_DY_CONFIG)
tx = build_optimizer(HP)
batch = _synthetic_batch(np.random.default_rng(211), batch=4)  # global
mesh = make_mesh(n_data=2, n_sp=2)  # 4 global devices, 2 per host
st = init_state(model, tx, jax.random.key(0), INPUT, batch_size=4)
sh = state_shardings(st, mesh)
# params replicated: device_put works per-host on addressable replicas
st = jax.tree.map(lambda x, s: jax.make_array_from_callback(
    np.shape(x), s, lambda idx, _x=np.asarray(x): _x[idx]), st, sh)
_, compile_step = make_sharded_train_step(model, tx, HP, INPUT, mesh,
                                          spatial=True)
from uavdet_tpu.parallel import local_batch_rows
rows = sorted(local_batch_rows(mesh, 4, spatial=True))
print(f"ROWS{pid} {rows}", flush=True)
st, m = compile_step(st)(st, shard_host_batch(batch, mesh, spatial=True))
from jax.experimental import multihost_utils
loss = float(m["loss"])
# param fingerprint from this host's addressable shards (params are
# replicated so both hosts see every leaf)
fp = float(sum(np.abs(np.asarray(v.addressable_shards[0].data)).sum()
               for v in jax.tree.leaves(st.params)))
print(f"WORKER{pid} loss={loss:.10f} fp={fp:.6f}", flush=True)
multihost_utils.sync_global_devices("done")
"""


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    from uavdet_tpu.data import make_synthetic_dataset
    root = tmp_path_factory.mktemp("antiuav_mh")
    return make_synthetic_dataset(str(root), splits=("train",), n_seq=2,
                                  n_frames=8, img_size=96)


def _records(dataset_root):
    from uavdet_tpu.data import build_index
    return build_index(os.path.join(dataset_root, "train"), seed=11)


@pytest.mark.parametrize("train,workers,mosaic",
                         [(True, 1, False), (True, 2, False),
                          (False, 1, False),
                          (True, 1, True), (True, 2, True)])
def test_sharded_decode_parity_full_rows(dataset_root, train, workers,
                                         mosaic):
    """local_rows covering EVERY row must reproduce the normal pipeline
    bitwise — geometry pass, RNG convention, pixel path all line up
    (mosaic-train included: quadrant membership replays geometry-only
    from header sizes, data.mosaic.mosaic_layout)."""
    from uavdet_tpu.data import DataPipeline
    recs = _records(dataset_root)
    kw = dict(input_size=64, batch_size=4, train=train, seed=5,
              workers=workers, mosaic=mosaic)
    ref = [jax.device_get(b) for b in DataPipeline(recs, **kw)]
    pipe = DataPipeline(recs, **kw)
    assert pipe.set_local_rows(range(4))
    pipe.device_prefetch = False
    got = list(pipe._batches())
    assert len(got) == len(ref) > 0
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a.image, b.image)
        np.testing.assert_array_equal(a.boxes, b.boxes)
        np.testing.assert_array_equal(a.box_mask, b.box_mask)


def test_sharded_decode_skips_unowned_rows(dataset_root):
    """local_rows={0,1}: those rows match the normal pipeline, rows 2-3
    stay zero (never decoded); boxes/mask stay globally exact."""
    from uavdet_tpu.data import DataPipeline
    recs = _records(dataset_root)
    kw = dict(input_size=64, batch_size=4, train=True, seed=5)
    ref = [jax.device_get(b) for b in DataPipeline(recs, **kw)]
    pipe = DataPipeline(recs, **kw)
    assert pipe.set_local_rows({0, 1})
    for a, b in zip(pipe._batches(), ref):
        np.testing.assert_array_equal(a.image[:2], b.image[:2])
        assert not a.image[2:].any()
        assert b.image[2:].any()  # the reference rows are real pixels
        np.testing.assert_array_equal(a.boxes, b.boxes)
        np.testing.assert_array_equal(a.box_mask, b.box_mask)


def test_set_local_rows_refuses_remote(dataset_root):
    """Remote (fs) loaders cannot replay geometry without fetching the
    object — set_local_rows falls back to full decode. (Mosaic-train no
    longer refuses: membership replays from headers, see
    test_sharded_decode_parity_full_rows[mosaic].)"""
    from uavdet_tpu.data import DataPipeline
    recs = _records(dataset_root)
    pipe = DataPipeline(recs, input_size=64, batch_size=4, train=True,
                        fs=object())
    assert not pipe.set_local_rows({0})
    assert pipe.local_rows is None
    # mosaic-train accepts
    pipe2 = DataPipeline(recs, input_size=64, batch_size=4, train=True,
                         mosaic=True)
    assert pipe2.set_local_rows({0})


def test_local_batch_rows_single_process_owns_all():
    from uavdet_tpu.parallel import local_batch_rows
    mesh = make_mesh(n_data=2, n_sp=2)
    assert local_batch_rows(mesh, 8, spatial=True) == frozenset(range(8))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_shard_host_batch_single_process_matches_shard_batch(rng):
    from uavdet_tpu.parallel import shard_batch
    batch = _synthetic_batch(rng, batch=4)
    mesh = make_mesh(n_data=2, n_fsdp=1, n_sp=2)
    a = shard_host_batch(batch, mesh, spatial=True)
    b = shard_batch(batch, mesh, spatial=True)
    assert a.image.sharding == b.image.sharding
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))


def test_two_process_cluster_matches_single_device(rng, tmp_path):
    """2 real processes × 2 virtual CPU devices, data×sp mesh over 4
    global devices: one sharded train step agrees across hosts AND with
    the single-device step."""
    # single-device oracle (in-process, 8-dev platform but unsharded step)
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    tx = build_optimizer(HP)
    batch = _synthetic_batch(np.random.default_rng(211), batch=4)
    st = init_state(model, tx, jax.random.key(0), INPUT, batch_size=4)
    st, m = make_train_step(model, tx, HP, INPUT)(st, batch)
    ref_loss = float(m["loss"])
    ref_fp = float(sum(np.abs(np.asarray(v)).sum()
                       for v in jax.tree.leaves(st.params)))

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p)  # axon-free: no tunnel block
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    import re
    rows = {}
    for out in outs:
        m2 = re.search(r"WORKER(\d) loss=([0-9.]+) fp=([0-9.]+)", out)
        assert m2, out[-3000:]
        rows[int(m2.group(1))] = (float(m2.group(2)), float(m2.group(3)))
    assert set(rows) == {0, 1}
    # bitwise agreement across hosts (same program, same global data)
    assert rows[0] == rows[1], rows
    # each host owns a disjoint half of the batch rows (sharded decode)
    owned = {int(m3.group(1)): eval(m3.group(2)) for out in outs
             if (m3 := re.search(r"ROWS(\d) (\[[0-9, ]*\])", out))}
    assert sorted(owned[0] + owned[1]) == [0, 1, 2, 3], owned
    assert set(owned[0]).isdisjoint(owned[1]), owned
    # parity with the single-device step
    np.testing.assert_allclose(rows[0][0], ref_loss, rtol=1e-3)
    np.testing.assert_allclose(rows[0][1], ref_fp, rtol=1e-3)


TRAINER_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
from uavdet_tpu.parallel import init_multihost
coord, pid, root, tmp = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
init_multihost(coordinator=coord, num_processes=2, process_id=pid)
assert len(jax.devices()) == 4

import pathlib
import numpy as np
from uavdet_tpu.data import DataPipeline, build_index
from uavdet_tpu.training import MetricsWriter, Trainer, init_state
from tests.test_trainer import _config

cfg = _config(pathlib.Path(tmp), devices=4, sp_devices=2, multihost=True,
              coordinator=coord, num_processes=2, process_id=pid,
              eval_ap=True, log_every_n_steps=1)
cfg.dataset.batch_size = 4
tr = DataPipeline(build_index(os.path.join(root, "train")), 64, 4,
                  train=True, seed=1)
va = DataPipeline(build_index(os.path.join(root, "train")), 64, 4,
                  train=False, seed=2)
t = Trainer(cfg, tr, va, metrics=MetricsWriter(os.path.join(tmp, f"dv{pid}")))
final = t.fit()
print(f"TROWS{pid} {sorted(tr.local_rows)}", flush=True)
print(f"TFINAL{pid} {final['val_loss']:.10f} {final['train_loss']:.10f} "
      f"{final.get('val_AP', -1.0):.10f}", flush=True)
# checkpoint round-trip: every process restores last into a host template
st0 = init_state(t.model, t.tx, jax.random.key(0), 64, batch_size=4)
st1 = t.ckpt.restore(st0, "last")
print(f"TCKPT{pid} {int(np.asarray(st1.step))}", flush=True)
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("trainer_done")
"""


def test_two_process_trainer_fit(dataset_root, tmp_path):
    """Full Trainer.fit in a real 2-process cluster (data=2 x sp=2 mesh,
    sharded host decode, multihost validate/AP/checkpoint/metrics):
    bitwise agreement across hosts, parity with the identical-mesh
    single-process fit, proc-0-only metrics files, restorable ckpt."""
    import re
    import pathlib
    from uavdet_tpu.data import DataPipeline, build_index
    from uavdet_tpu.training import MetricsWriter, Trainer
    from tests.test_trainer import _config

    script = tmp_path / "trainer_worker.py"
    script.write_text(TRAINER_WORKER)
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p)  # axon-free: no tunnel block
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(pid), dataset_root,
         str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in (0, 1)]

    # identical-mesh single-process oracle, same data and seeds
    cfg = _config(tmp_path / "sp", devices=4, sp_devices=2, eval_ap=True,
                  log_every_n_steps=1)
    cfg.dataset.batch_size = 4
    tr = DataPipeline(build_index(os.path.join(dataset_root, "train")),
                      64, 4, train=True, seed=1)
    va = DataPipeline(build_index(os.path.join(dataset_root, "train")),
                      64, 4, train=False, seed=2)
    ref = Trainer(cfg, tr, va,
                  metrics=MetricsWriter(str(tmp_path / "sp" / "dv"))).fit()

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
        assert p.returncode == 0, out[-4000:]
    finals, rows, steps = {}, {}, {}
    for out in outs:
        mf = re.search(r"TFINAL(\d) ([-0-9.]+) ([-0-9.]+) ([-0-9.]+)", out)
        assert mf, out[-4000:]
        finals[int(mf.group(1))] = tuple(float(mf.group(k))
                                         for k in (2, 3, 4))
        mr = re.search(r"TROWS(\d) (\[[0-9, ]*\])", out)
        rows[int(mr.group(1))] = eval(mr.group(2))
        mc = re.search(r"TCKPT(\d) (\d+)", out)
        steps[int(mc.group(1))] = int(mc.group(2))

    # hosts agree bitwise (identical replicated metrics)
    assert finals[0] == finals[1], finals
    # sharded host decode: disjoint halves covering the batch
    assert sorted(rows[0] + rows[1]) == [0, 1, 2, 3], rows
    assert set(rows[0]).isdisjoint(rows[1]), rows
    # parity with the identical-mesh single-process fit (rtol as in
    # test_two_process_cluster_matches_single_device: cross-host gloo
    # collectives reassociate reductions differently than in-process)
    np.testing.assert_allclose(finals[0][0], ref["val_loss"], rtol=1e-3)
    np.testing.assert_allclose(finals[0][1], ref["train_loss"], rtol=1e-3)
    # AP is piecewise-constant — near-tie ranks can flip under the same
    # reassociation noise, so compare loosely (worker-vs-worker equality
    # is already bitwise via the finals check above)
    np.testing.assert_allclose(finals[0][2], ref["val_AP"], atol=0.02)
    # the checkpoint restores on every process; 2 train steps happened
    assert steps[0] == steps[1] == 2, steps
    # one metrics writer: process 0 only
    assert os.path.exists(tmp_path / "dv0" / "metrics.json")
    assert not os.path.exists(tmp_path / "dv1" / "metrics.json")
