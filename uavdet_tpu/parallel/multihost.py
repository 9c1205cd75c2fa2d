"""Multi-host (pod-scale) runtime — jax.distributed + per-process batches.

The reference is strictly single-process, single-GPU (`devices: 1`,
reference params.yaml:28; SURVEY §2.6 absence audit). On a TPU pod each
host runs ONE process that owns a slice of the chips; the mesh spans all
chips and XLA collectives ride ICI within a host/slice and DCN between
hosts. The three things a framework must provide on top of the
single-host mesh code (parallel/mesh.py):

1. runtime rendezvous — ``jax.distributed.initialize`` so every process
   sees the global device set (``init_multihost``);
2. globally-consistent mesh construction — ``make_mesh`` already uses
   ``jax.devices()`` which is global after initialize, and every process
   builds the identical mesh (same factorization, same device order);
3. turning host-side batches into globally-sharded ``jax.Array``s — a
   host can only materialize buffers on its own chips, so plain
   ``shard_batch``'s device_put cannot work across hosts.
   ``shard_host_batch`` uses ``jax.make_array_from_callback``: every
   process iterates the SAME deterministic pipeline (seeded shuffle →
   identical global batch order on all hosts) and jax pulls from each
   host exactly the global slices its own devices hold — correct for
   ANY mesh factorization, no shard/process alignment assumptions.

Config surface: ``train.trainer.multihost: true`` plus the optional
``coordinator/num_processes/process_id`` keys (all auto-detected on real
TPU pods; explicit values are for CPU/GPU clusters and tests).

Host decode is sharded too: ``local_batch_rows`` computes which global
batch rows live on this process's devices, and
``DataPipeline.set_local_rows`` restricts pixel decode to those rows
(batch membership stays globally consistent — it depends only on box
geometry, which every host replays from manifest records without
decoding; see data/pipeline.py::_batches_sharded). Host decode cost
falls by the process count.
"""

from typing import Optional

import jax
import numpy as np

from ..utils.datatypes import BatchData
from .mesh import batch_shardings

_INITIALIZED = False


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None,
                   local_device_ids=None) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    On real TPU pods all arguments are auto-detected from the TPU
    metadata — call with no args. On CPU/GPU clusters (and in tests)
    pass ``coordinator`` ("host:port"), ``num_processes`` and
    ``process_id`` explicitly. Must run before any other jax call that
    initializes the backend; safe to skip entirely for single-process
    runs (everything degrades to the single-host path).
    """
    global _INITIALIZED
    # NB: the guard must NOT call jax.process_count()/jax.devices() —
    # those initialize the XLA backend, after which distributed.initialize
    # refuses to run. is_initialized() only inspects the coordination
    # client.
    if _INITIALIZED or jax.distributed.is_initialized():
        _INITIALIZED = True
        return
    kw = {}
    if coordinator is not None:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = int(num_processes)
    if process_id is not None:
        kw["process_id"] = int(process_id)
    if local_device_ids is not None:
        kw["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kw)
    _INITIALIZED = True


def local_batch_rows(mesh, batch_size: int,
                     spatial: bool = False) -> frozenset:
    """Global-batch row indices whose image shards live on THIS process's
    devices. Feed to ``DataPipeline.set_local_rows`` so each host decodes
    only its own rows; ``shard_host_batch`` never reads the others
    (make_array_from_callback materializes addressable shards only)."""
    sh = batch_shardings(mesh, spatial).image
    # only dim 0 (batch) matters for row ownership; H is a dummy that
    # must divide the 'sp' axis — use the axis size itself
    shape = (batch_size, dict(mesh.shape).get("sp", 1), 1, 1)
    rows = set()
    for dev, idx in sh.devices_indices_map(shape).items():
        if dev.process_index == jax.process_index():
            rows.update(range(*idx[0].indices(batch_size)))
    return frozenset(rows)


def put_state(state, shardings):
    """Place a host-side (numpy/process-local, process-identical) train
    state onto the mesh per ``shardings``. Multi-process-safe: plain
    ``device_put`` cannot target non-addressable devices, so with >1
    process each host contributes the addressable shards of every global
    array via ``make_array_from_callback`` (replicated leaves are read
    whole on each host — identical by the deterministic-init/restore
    convention)."""
    def put(x, s):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, s)
        return jax.make_array_from_callback(x.shape, s,
                                            lambda idx, _x=x: _x[idx])
    return jax.tree.map(put, state, shardings)


def shard_host_batch(batch: BatchData, mesh, spatial: bool = False
                     ) -> BatchData:
    """Host-side GLOBAL batch (identical copy on every process, the
    deterministic-pipeline convention) → globally-sharded jax.Arrays.
    Single-process this is exactly ``shard_batch``."""
    shardings = batch_shardings(mesh, spatial)

    def put(x, s):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, s)
        return jax.make_array_from_callback(x.shape, s,
                                            lambda idx, _x=x: _x[idx])

    return jax.tree.map(put, batch, shardings)
