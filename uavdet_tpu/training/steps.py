"""Jitted train/eval steps.

One fused XLA program per step: forward (bf16-capable) → on-device YOLO
target encoding → dense loss → backward → optimizer update. This replaces
the reference's Lightning training_step + host-side target generation
(model/_base.py:313-326 + dataset/AntiUAVDataset.py:141-185).

Effective head scales are derived from the actual feature-map sizes
(input_size // grid_h), which equals the configured head_scales for
Baseline/DyYOLO ([32,16,8] → grids [20,40,80] at 640px) and fixes the
shipped DySOEM_SimFPN scale mismatch (SURVEY §2.3).
"""

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.losses import yolo_loss
from ..ops.targets import encode_yolo_targets
from ..utils.datatypes import BatchData, TrainState


def init_state(model, tx, rng, input_size: int, batch_size: int = 1,
               channels: int = 3) -> TrainState:
    """Initialize params/batch_stats/opt_state with a dummy batch."""
    x = jnp.zeros((batch_size, input_size, input_size, channels),
                  jnp.float32)
    variables = model.init(rng, x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def _loss_weights(hparams):
    lb = hparams.loss_balancing
    get = (hparams.get if hasattr(hparams, "get")
           else lambda k, d: getattr(hparams, k, d))
    return dict(
        obj_scales_w=tuple(float(w) for w in lb.obj_scales_w),
        bbox_w=float(lb.bbox_w),
        objectness_w=float(lb.objectness_w),
        no_obj_w=float(lb.no_obj_w),
        bbox_loss_fn=str(hparams.bbox_loss_fn),
        # 'elementwise' (default, deliberate improvement) or 'col0'
        # (reference-exact ious[:, 0] soft labels, utils/postprocess.py:80-82)
        # — selectable from params.yaml for parity training runs
        iou_mode=str(get("iou_mode", "elementwise")),
    )


def make_train_step(model, tx, hparams, input_size: int,
                    compute_dtype=jnp.float32, donate: bool = False,
                    remat=False, fold_early: bool = False):
    """Build the jitted train step: (state, batch) → (state, metrics).

    ``donate``: donate the input state's buffers to the output state
    (in-place param/optimizer update — saves one params+opt-state
    allocation + copy per step). The caller must NOT reuse the old state
    after the call; the trainer enables this only when ``nan_guard`` is
    off (the guard re-uses the pre-step state to skip poisoned batches).

    ``remat``: rematerialize the forward pass in the backward
    (``jax.checkpoint``) — trades FLOPs for activation memory so larger
    batches / resolutions fit HBM. ``True`` saves nothing (recompute
    all); a string names a ``jax.checkpoint_policies`` entry, e.g.
    ``'dots_saveable'`` (keep matmul/conv outputs, recompute the cheap
    elementwise chains — the usual sweet spot on TPU).

    ``fold_early``: run the early stage (the [B,1]+[C,3,2] tokens after
    the two stem tokens) in the parity-folded 2x2→channels layout
    (ops/fold_early.fold_early_train_apply) — reassociation-level-equal
    training on the same parameter tree, lane-dense early activations.
    Warns and falls back to the plain step when the model's layer_config
    doesn't match the fold's stem/early pattern.
    """
    anchors = np.asarray(hparams.anchors, np.float32)
    weights = _loss_weights(hparams)

    folded = None
    if fold_early:
        from ..ops.fold_early import fold_early_train_apply
        folded = fold_early_train_apply(model)
        if folded is None:
            print("WARNING: fold_early=true but the model's layer_config "
                  "does not match the foldable stem/early pattern "
                  "(ops/fold_early) — running the unfolded train step")

    if folded is not None:
        # parity-folded early stage (ops/fold_early): same math on the
        # original parameter tree, lane-dense @H/2 activations —
        # measured +4.5% on the cfg6 step (PERF.md round-4)
        def fwd(params, batch_stats, x):
            outs, new_stats = folded(
                {"params": params, "batch_stats": batch_stats}, x)
            return outs, {"batch_stats": new_stats}
    else:
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

    @partial(jax.jit, **({"donate_argnums": (0,)} if donate else {}))
    def train_step(state: TrainState, batch: BatchData):
        (_, (lb, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt, step=state.step + 1)
        metrics = {"loss": lb.total, "bbox_loss": lb.bbox,
                   "obj_loss": lb.obj}
        return new_state, metrics

    return train_step


def make_eval_step(model, hparams, input_size: int,
                   compute_dtype=jnp.float32):
    """Build the jitted eval step: (state, batch) → metrics (val loss)."""
    anchors = np.asarray(hparams.anchors, np.float32)
    weights = _loss_weights(hparams)

    @jax.jit
    def eval_step(state: TrainState, batch: BatchData):
        x = batch.image.astype(compute_dtype)
        outs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x,
            train=False)
        scales = tuple(input_size // o.obj.shape[2] for o in outs)
        grids = encode_yolo_targets(batch.boxes, batch.box_mask,
                                    anchors, scales, input_size)
        lb = yolo_loss(outs, grids, anchors, scales, **weights)
        return {"loss": lb.total, "bbox_loss": lb.bbox, "obj_loss": lb.obj}

    return eval_step
