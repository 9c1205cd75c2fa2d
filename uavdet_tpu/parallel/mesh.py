"""Device mesh + sharding rules.

The reference has NO multi-device code (SURVEY §2.6: no DDP/FSDP/TP/PP —
`devices: 1`, params.yaml:28). The TPU-native replacement is a
``jax.sharding.Mesh`` over ICI with pjit-compiled collectives:

* axis ``data``  — batch-dim data parallelism (the DP/DDP equivalent).
  Params are replicated; XLA inserts the gradient ``psum`` automatically
  when a jitted step consumes a data-sharded batch and produces replicated
  params.
* axis ``fsdp``  — optional parameter sharding (ZeRO/FSDP equivalent):
  large conv kernels are sharded on their output-channel axis and XLA
  all-gathers them at use; gradients reduce-scatter back. Enabled with
  ``fsdp_axis_size > 1``.
* axis ``sp``    — spatial partitioning: activations are sharded on the
  image-row (H) dimension and GSPMD partitions every convolution
  spatially, exchanging only the kernel-halo rows between neighbours
  (``collective-permute`` over ICI — verified in the optimized HLO: the
  probe program shows 0 all-gathers and one halo exchange per conv
  operand). This is the scaling axis SURVEY §2.6 names for the 1280px
  DySOEM workload (BASELINE config 3): per-chip activation memory falls
  by the sp factor, so resolutions/batches that overflow one chip's HBM
  run without host-side microbatching. A pure CNN has no sequence dim —
  ``sp`` IS this model family's sequence-parallel analogue.

Config surface: ``train.trainer.devices`` (reference params.yaml:28) is
the TOTAL mesh size; the TPU-native extras ``train.trainer.fsdp_devices``
and ``train.trainer.sp_devices`` (both default 1) factor it into
data × fsdp × sp; ``accelerator`` picks the platform.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.losses import yolo_loss
from ..ops.targets import encode_yolo_targets
from ..utils.datatypes import BatchData, TrainState


def make_mesh(n_data: int | None = None, n_fsdp: int = 1, n_sp: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'fsdp', 'sp') mesh. Defaults to all visible
    devices on the data axis; the ``fsdp``/``sp`` axes are size 1 unless
    requested, so every PartitionSpec can reference them uniformly."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_fsdp * n_sp)
    dev = np.asarray(devices[:n_data * n_fsdp * n_sp]).reshape(
        n_data, n_fsdp, n_sp)
    return Mesh(dev, axis_names=("data", "fsdp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def image_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """NHWC frames: batch over 'data', rows over 'sp' when spatial."""
    if spatial and "sp" not in mesh.axis_names:
        raise ValueError("spatial sharding needs an 'sp' mesh axis "
                         f"(mesh has {mesh.axis_names}); build the mesh "
                         "with make_mesh(..., n_sp=...)")
    return NamedSharding(mesh, P("data", "sp") if spatial else P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings(mesh: Mesh, spatial: bool = False) -> BatchData:
    """Per-field NamedShardings for a BatchData: frames are additionally
    row-sharded over 'sp' when ``spatial`` (boxes/masks stay batch-only —
    they carry no spatial dim)."""
    return BatchData(image=image_sharding(mesh, spatial),
                     boxes=batch_sharding(mesh),
                     box_mask=batch_sharding(mesh))


def shard_batch(batch: BatchData, mesh: Mesh,
                spatial: bool = False) -> BatchData:
    return jax.tree.map(jax.device_put, batch,
                        batch_shardings(mesh, spatial))


def _param_spec(path_leaf, fsdp: bool) -> P:
    """FSDP rule: shard the largest (last) axis of big kernels across
    'fsdp'; everything else replicated."""
    if not fsdp:
        return P()
    leaf = path_leaf
    if leaf.ndim >= 2 and leaf.shape[-1] % 2 == 0 and leaf.size >= 2**14:
        return P(*([None] * (leaf.ndim - 1) + ["fsdp"]))
    return P()


def state_shardings(state: TrainState, mesh: Mesh,
                    fsdp: bool = False) -> TrainState:
    """NamedShardings for every leaf of the train state."""
    def spec_of(leaf):
        return NamedSharding(mesh, _param_spec(leaf, fsdp))

    params_s = jax.tree.map(spec_of, state.params)
    # optimizer state mirrors param sharding where shapes match
    def opt_spec(leaf):
        return NamedSharding(mesh, _param_spec(leaf, fsdp)
                             if hasattr(leaf, "ndim") else P())

    return TrainState(
        params=params_s,
        batch_stats=jax.tree.map(
            lambda _: NamedSharding(mesh, P()), state.batch_stats),
        opt_state=jax.tree.map(opt_spec, state.opt_state),
        step=NamedSharding(mesh, P()),
    )


def make_sharded_train_step(model, tx, hparams, input_size: int, mesh: Mesh,
                            fsdp: bool = False, spatial: bool = False,
                            compute_dtype=jnp.float32,
                            donate: bool = False, remat=False):
    """DP(+optional FSDP/spatial) train step compiled over the mesh.

    The batch arrives sharded on 'data' (frames additionally row-sharded
    over 'sp' with ``spatial`` — GSPMD partitions the convs with halo
    exchanges and the loss/BN reductions psum across both axes);
    params/opt-state live with the shardings from ``state_shardings``.
    XLA lowers the implied gradient reduction to a psum over ICI.
    ``donate``/``remat`` mirror ``training.steps.make_train_step``
    (in-place state buffers / jax.checkpoint activation recompute).
    """
    anchors = np.asarray(hparams.anchors, np.float32)
    from ..training.steps import _loss_weights
    weights = _loss_weights(hparams)

    def fwd(params, batch_stats, x):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, mutable=["batch_stats"])

    if remat:
        policy = (None if remat is True
                  else getattr(jax.checkpoint_policies, str(remat)))
        fwd = jax.checkpoint(fwd, policy=policy)

    def loss_fn(params, batch_stats, batch: BatchData):
        x = batch.image.astype(compute_dtype)
        outs, mutated = fwd(params, batch_stats, x)
        scales = tuple(input_size // o.obj.shape[2] for o in outs)
        grids = encode_yolo_targets(batch.boxes, batch.box_mask,
                                    anchors, scales, input_size)
        lb = yolo_loss(outs, grids, anchors, scales, **weights)
        return lb.total, (lb, mutated["batch_stats"])

    def step_fn(state: TrainState, batch: BatchData):
        (_, (lb, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, {"loss": lb.total, "bbox_loss": lb.bbox,
                           "obj_loss": lb.obj}

    def compile_step(state: TrainState):
        st_sh = state_shardings(state, mesh, fsdp)
        metrics_sh = {k: NamedSharding(mesh, P())
                      for k in ("loss", "bbox_loss", "obj_loss")}
        return jax.jit(
            step_fn,
            in_shardings=(st_sh, batch_shardings(mesh, spatial)),
            out_shardings=(st_sh, metrics_sh),
            **({"donate_argnums": (0,)} if donate else {}))

    return step_fn, compile_step
