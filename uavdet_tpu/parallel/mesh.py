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
  ``fsdp_axis_size > 1``. ZeRO convention: the batch dim ALSO shards
  over 'fsdp' (see ``BATCH_AXES``) — fsdp devices are data-parallel
  workers that happen to store only a slice of the params. Cannot be
  combined with 'sp' (measured XLA GSPMD miscompilation —
  ``check_layout_supported``).
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
* axis ``ep``    — expert parallelism for the dynamic convolutions, this
  model family's MoE analogue: every DyConv/DySOEM block computes E
  expert convolutions stacked on the output-channel axis and mixes them
  with per-sample attention (models/layers.py, models/dysoem_simfpn.py).
  Sharding the stacked expert kernels (and their optimizer state) on
  that axis makes each device compute a slice of the experts; the
  attention contraction over E becomes the psum. Because the stack is a
  plain channel axis, this is simultaneously the tensor-parallel (TP)
  form for these layers — the E× expert FLOPs and the E×-wide
  intermediate shard across chips even when ep does not divide E. The
  batch dim also shards over 'ep' (``BATCH_AXES``), so ep devices stay
  data-parallel for the non-expert layers.

Pipeline parallelism ('pp') lives in ``parallel.pipeline`` as a separate
1-axis mesh (``train.trainer.pp_devices``), NOT as a fifth axis here —
and it is NOT recommended for the shipped detectors: their weights are
~27 MB (every chip holds them for free; 'fsdp' already shards them if
wanted), activations dominate memory and 'sp'/'data' shard those, so
splitting a 20-layer CNN into stages only adds bubble overhead with
nothing to hide. 'pp' exists for the regimes where it is the right axis
(deep stacked variants, param-heavy models) and to complete the
parallelism matrix. (The scaling-book recipe: pick the axes the
workload is actually bound by.)

Config surface: ``train.trainer.devices`` (reference params.yaml:28) is
the TOTAL mesh size; the TPU-native extras ``train.trainer.fsdp_devices``,
``train.trainer.sp_devices`` and ``train.trainer.ep_devices`` (all
default 1) factor it into data × fsdp × sp × ep; ``accelerator`` picks
the platform.
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
              n_ep: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'fsdp', 'sp', 'ep') mesh. Defaults to all visible
    devices on the data axis; the other axes are size 1 unless requested,
    so every PartitionSpec can reference them uniformly."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_fsdp * n_sp * n_ep)
    n = n_data * n_fsdp * n_sp * n_ep
    dev = np.asarray(devices[:n]).reshape(n_data, n_fsdp, n_sp, n_ep)
    return Mesh(dev, axis_names=("data", "fsdp", "sp", "ep"))


# The batch dim shards over ALL non-spatial axes (ZeRO convention: 'fsdp'
# and 'ep' devices are data-parallel too; params shard over their axis and
# gradients reduce-scatter back). This is both the standard design AND a
# correctness requirement: leaving the batch replicated across a ≥2-sized
# mesh axis while activations are 'sp'-row-sharded trips an XLA GSPMD
# mis-reduction (jax 0.9.0) where conv KERNEL gradients come back scaled
# by the replication degree — forward losses match, updates are wrong.
# Minimal repro: a lone 3×3 SAME conv, x at P(('data',), 'sp') on a mesh
# with an unused fsdp=2 axis → dL/dk exactly 2× (tested in
# tests/test_parallel.py::test_all_axes_combined_step_matches_single_device,
# which fails under the old layout). Batch-grouping every non-spatial axis
# removes the partial replication that triggers it.
BATCH_AXES = ("data", "fsdp", "ep")


def batch_group_size(mesh: Mesh) -> int:
    """Number of ways the batch dim is sharded (data × fsdp × ep)."""
    shape = dict(mesh.shape)
    return int(np.prod([shape.get(a, 1) for a in BATCH_AXES]))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXES))


def image_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """NHWC frames: batch over the ZeRO group, rows over 'sp' when
    spatial."""
    if spatial and "sp" not in mesh.axis_names:
        raise ValueError("spatial sharding needs an 'sp' mesh axis "
                         f"(mesh has {mesh.axis_names}); build the mesh "
                         "with make_mesh(..., n_sp=...)")
    return NamedSharding(mesh, P(BATCH_AXES, "sp") if spatial
                         else P(BATCH_AXES))


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


def _param_spec(path, leaf, fsdp: bool, ep_size: int = 1) -> P:
    """Sharding rules, in precedence order:

    * EP: a leaf living under an ``experts`` module/param (the stacked
      expert kernels and their biases — DyConvModule's ``experts`` param,
      DySOEM's ``experts`` submodule) with an 'ep'-divisible last
      (stacked-channel) axis shards that axis across 'ep'. Optimizer
      state mirrors it because the optax trace replays the params tree
      (same dict keys, so the same path match fires).
    * FSDP: shard the largest (last) axis of big kernels across 'fsdp'.
    * Everything else replicated.
    """
    if not hasattr(leaf, "ndim"):
        return P()
    if (ep_size > 1 and leaf.ndim >= 1 and leaf.shape[-1] % ep_size == 0
            and any("experts" in str(getattr(k, "key", k)) for k in path)):
        return P(*([None] * (leaf.ndim - 1) + ["ep"]))
    if fsdp and leaf.ndim >= 2 and leaf.shape[-1] % 2 == 0 \
            and leaf.size >= 2**14:
        return P(*([None] * (leaf.ndim - 1) + ["fsdp"]))
    return P()


def state_shardings(state: TrainState, mesh: Mesh, fsdp: bool = False,
                    ep: bool = False) -> TrainState:
    """NamedShardings for every leaf of the train state."""
    ep_size = dict(mesh.shape).get("ep", 1) if ep else 1

    def spec_of(path, leaf):
        return NamedSharding(mesh, _param_spec(path, leaf, fsdp, ep_size))

    tmap = jax.tree_util.tree_map_with_path
    return TrainState(
        params=tmap(spec_of, state.params),
        batch_stats=jax.tree.map(
            lambda _: NamedSharding(mesh, P()), state.batch_stats),
        # optimizer state mirrors param sharding where paths/shapes match
        opt_state=tmap(spec_of, state.opt_state),
        step=NamedSharding(mesh, P()),
    )


def check_layout_supported(mesh: Mesh, fsdp: bool, spatial: bool) -> None:
    """Reject FSDP param sharding combined with spatial partitioning.

    XLA GSPMD (jax 0.9.0) miscompiles the backward of convolutions whose
    kernel is sharded on a channel axis while the input rows are sharded
    over 'sp': kernel gradients come back wrong by O(100×) at float64
    (so it is a miscompilation, not reassociation noise) while the
    forward loss matches. Measured on the full DyYOLO graph —
    scripts/gspmd_fsdp_sp_repro.py; both output- and input-channel kernel
    sharding are affected. Every other composition is verified exact at
    f64: data, fsdp (no sp), sp, ep, data×fsdp, data×ep, sp×ep, and
    fsdp-as-pure-batch-axis (fsdp=False with fsdp mesh dim >1, which the
    ZeRO batch grouping makes useful). Re-run the repro after a jax
    upgrade to lift this."""
    shape = dict(mesh.shape)
    if fsdp and spatial and shape.get("fsdp", 1) > 1 and shape.get("sp", 1) > 1:
        raise ValueError(
            "FSDP param sharding cannot be combined with spatial ('sp') "
            "partitioning: XLA GSPMD miscompiles sharded-kernel conv "
            "gradients under row-sharded activations (verified at f64, "
            "see scripts/gspmd_fsdp_sp_repro.py). Use sp with replicated "
            "params (the fsdp mesh axis still carries batch shards), or "
            "fsdp without sp.")


def make_sharded_train_step(model, tx, hparams, input_size: int, mesh: Mesh,
                            fsdp: bool = False, spatial: bool = False,
                            ep: bool = False,
                            compute_dtype=jnp.float32,
                            donate: bool = False, remat=False):
    """DP(+optional FSDP/spatial/expert) train step compiled over the mesh.

    The batch arrives sharded over the ZeRO group (frames additionally row-sharded
    over 'sp' with ``spatial`` — GSPMD partitions the convs with halo
    exchanges and the loss/BN reductions psum across both axes);
    params/opt-state live with the shardings from ``state_shardings``
    (``ep`` shards the stacked expert kernels — see the module
    docstring). XLA lowers the implied gradient reduction to a psum over
    ICI. ``donate``/``remat`` mirror ``training.steps.make_train_step``
    (in-place state buffers / jax.checkpoint activation recompute).
    """
    check_layout_supported(mesh, fsdp, spatial)
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
        st_sh = state_shardings(state, mesh, fsdp, ep)
        metrics_sh = {k: NamedSharding(mesh, P())
                      for k in ("loss", "bbox_loss", "obj_loss")}
        return jax.jit(
            step_fn,
            in_shardings=(st_sh, batch_shardings(mesh, spatial)),
            out_shardings=(st_sh, metrics_sh),
            **({"donate_argnums": (0,)} if donate else {}))

    return step_fn, compile_step
