"""Reproducer: XLA GSPMD miscompiles sharded-kernel conv gradients under
spatial (row) sharding — jax 0.9.0.

Two distinct failure modes were isolated while building the 'sp'/'ep'
mesh axes (both found by f64 gradient parity of the full DyYOLO train
step vs single-device; forward losses always match, so nothing in
training "looks" wrong — the updates are silently incorrect):

1. PARTIAL-REPLICATION DOUBLE-COUNT. With the batch sharded over 'data'
   only, activations row-sharded over 'sp', and any OTHER mesh axis of
   size >= 2 present (even completely unused), conv KERNEL gradients come
   back multiplied by the replication degree over the unused axes
   (exactly 2x for one extra axis of 2, 4x for fsdp=4 or fsdp=2*ep=2).
   A lone 3x3 SAME conv reproduces it. FIX (shipped): shard the batch
   over every non-spatial axis — parallel.mesh.BATCH_AXES, the ZeRO
   convention — so no conv operand is partially replicated.

2. SHARDED-KERNEL x ROW-SHARDED-INPUT GRAD CORRUPTION. With the ZeRO
   batch grouping in place, sharding conv kernels on a channel axis
   (output OR input) across 'fsdp' while activations are 'sp'-row-sharded
   yields kernel gradients wrong by O(100x) relative at f64 on the full
   DyYOLO graph (single-conv microbenchmarks pass; the trigger needs the
   deeper graph). No workaround found (with_sharding_constraint on conv
   outputs makes it worse). MITIGATION (shipped): parallel.mesh.
   check_layout_supported rejects fsdp-sharding combined with spatial
   partitioning; the fsdp mesh axis still carries batch shards.

Verified-exact layouts at f64 (worst rel grad diff): data 2e-13,
data x fsdp(sharded) 2e-13, data x ep 2e-13, sp 4e-8, sp x ep 4e-8,
fsdp-axis-as-batch x sp 4e-8. Broken: fsdp(sharded) x sp 1.3e2,
in-channel variant 1.3e0.

Run after a jax upgrade; if both checks print OK, the restriction in
check_layout_supported can be lifted.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def check_unused_axis_double_count():
    """Failure mode 1 on a lone conv: expect ratio 1.0, broken gives 2.0."""
    devs = np.asarray(jax.devices()[:4]).reshape(1, 2, 2, 1)
    mesh = Mesh(devs, ("data", "fsdp", "sp", "ep"))
    k = jax.random.normal(jax.random.key(1), (3, 3, 16, 16), jnp.float64)
    x = jax.random.normal(jax.random.key(2), (2, 16, 64, 16), jnp.float64)

    def loss(k, x):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y * y)

    g1 = jax.jit(jax.grad(loss))(k, x)
    # batch over 'data' ONLY (pre-ZeRO layout): fsdp=2 is an unused axis
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "sp")))
    kr = jax.device_put(k, NamedSharding(mesh, P()))
    g2 = jax.jit(jax.grad(loss),
                 in_shardings=(NamedSharding(mesh, P()),
                               NamedSharding(mesh, P("data", "sp"))))(kr, xs)
    ratio = float(jnp.abs(g2).sum() / jnp.abs(g1).sum())
    ok = abs(ratio - 1.0) < 1e-9
    print(f"unused-axis double-count: grad ratio {ratio:.6f} "
          f"{'OK' if ok else 'BROKEN (expected 1.0)'}")
    return ok


def check_fsdp_sp_model_grads():
    """Failure mode 2 on the full DyYOLO train-step gradient at f64."""
    from uavdet_tpu.models import DyYOLO
    from uavdet_tpu.ops.losses import yolo_loss
    from uavdet_tpu.ops.targets import encode_yolo_targets
    from uavdet_tpu.parallel import make_mesh, shard_batch
    from uavdet_tpu.parallel.mesh import batch_shardings, state_shardings
    from uavdet_tpu.training import build_optimizer, init_state
    from uavdet_tpu.training.steps import _loss_weights

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.test_models import TINY_DY_CONFIG
    from tests.test_train_step import HP, INPUT, _synthetic_batch

    model = DyYOLO(layer_config=TINY_DY_CONFIG, dtype=jnp.float64)
    tx = build_optimizer(HP)
    cast = (lambda v: v.astype(jnp.float64)
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
            else v)
    batch = jax.tree.map(cast, _synthetic_batch(
        np.random.default_rng(0), batch=4))
    anchors = np.asarray(HP.anchors, np.float64)
    weights = _loss_weights(HP)
    st = jax.tree.map(cast, init_state(
        model, tx, jax.random.key(0), INPUT, batch_size=4))

    def loss_fn(params, batch_stats, batch):
        outs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch.image,
            train=True, mutable=["batch_stats"])
        scales = tuple(INPUT // o.obj.shape[2] for o in outs)
        grids = encode_yolo_targets(batch.boxes, batch.box_mask, anchors,
                                    scales, INPUT)
        return yolo_loss(outs, grids, anchors, scales, **weights).total

    g1 = jax.jit(jax.grad(loss_fn))(st.params, st.batch_stats, batch)
    mesh = make_mesh(n_data=1, n_fsdp=2, n_sp=2, n_ep=1)
    sh = state_shardings(st, mesh, fsdp=True)
    st2 = jax.tree.map(jax.device_put, st, sh)
    g2 = jax.jit(jax.grad(loss_fn),
                 in_shardings=(sh.params, sh.batch_stats,
                               batch_shardings(mesh, spatial=True)))(
        st2.params, st2.batch_stats, shard_batch(batch, mesh, spatial=True))
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) /
        max(float(np.max(np.abs(np.asarray(a)))), 1e-9)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)))
    ok = worst < 1e-6
    print(f"fsdp-sharded x sp model grads: worst rel diff {worst:.3e} "
          f"{'OK' if ok else 'BROKEN (f64 — miscompilation, not noise)'}")
    return ok


if __name__ == "__main__":
    ok1 = check_unused_axis_double_count()
    ok2 = check_fsdp_sp_model_grads()
    print("ALL OK — restriction can be lifted" if ok1 and ok2
          else "still broken — keep check_layout_supported")
