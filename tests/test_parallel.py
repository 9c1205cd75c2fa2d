"""Mesh / sharding tests on the 8-device virtual CPU platform.

Validates: DP gradient equivalence (sharded step == single-device step),
FSDP parameter sharding compiles and runs, dryrun_multichip contract.
"""

import numpy as np
import jax
import jax.numpy as jnp

from uavdet_tpu.models import DyYOLO
from uavdet_tpu.parallel import make_mesh, make_sharded_train_step, \
    shard_batch
from uavdet_tpu.parallel.mesh import state_shardings
from uavdet_tpu.training import build_optimizer, init_state, make_train_step
from uavdet_tpu.utils.datatypes import BatchData
from tests.test_models import TINY_DY_CONFIG
from tests.test_train_step import HP, INPUT, _synthetic_batch


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_matches_single_device(rng):
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    tx = build_optimizer(HP)
    batch = _synthetic_batch(rng, batch=8)

    # single-device
    st1 = init_state(model, tx, jax.random.key(0), INPUT, batch_size=8)
    step1 = make_train_step(model, tx, HP, INPUT)
    st1, m1 = step1(st1, batch)

    # 8-way DP
    mesh = make_mesh(n_data=8, n_fsdp=1)
    st2 = init_state(model, tx, jax.random.key(0), INPUT, batch_size=8)
    sh = state_shardings(st2, mesh, fsdp=False)
    st2 = jax.tree.map(jax.device_put, st2, sh)
    _, compile_step = make_sharded_train_step(model, tx, HP, INPUT, mesh)
    st2, m2 = compile_step(st2)(st2, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-3)
    # gradient reassociation across the 8-way psum amplifies through the
    # deep backward chain; params agree to ~1e-2 relative after one step
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)


def test_sharded_detector_matches_single_device(rng):
    """Data-axis pjit inference == single-device inference, bit-for-bit
    shapes and near-identical values (same program, different layout)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from uavdet_tpu.inference import make_detector

    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    x0 = jnp.zeros((8, INPUT, INPUT, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    imgs = (rng.uniform(size=(8, INPUT, INPUT, 3)) * 255).astype(np.uint8)

    det1 = make_detector(model, HP, INPUT, pre_nms_topk=64, max_det=16,
                         compute_dtype=jnp.float32)
    d1 = det1(variables, jnp.asarray(imgs))

    mesh = make_mesh(n_data=8, n_fsdp=1)
    rep = NamedSharding(mesh, P())
    vars_r = jax.tree.map(lambda v: jax.device_put(v, rep), variables)
    imgs_s = jax.device_put(imgs, NamedSharding(mesh, P("data")))
    det8 = make_detector(model, HP, INPUT, pre_nms_topk=64, max_det=16,
                         compute_dtype=jnp.float32, mesh=mesh)
    d8 = det8(vars_r, imgs_s)

    assert "data" in str(d8.boxes.sharding.spec)
    np.testing.assert_array_equal(np.asarray(d1.valid), np.asarray(d8.valid))
    np.testing.assert_allclose(np.asarray(d1.boxes), np.asarray(d8.boxes),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d1.scores), np.asarray(d8.scores),
                               rtol=1e-5, atol=1e-6)


def test_sharded_dual_detector_runs(rng):
    """Dual-stream detector over a data-axis mesh: both native-res input
    streams sharded on 'data', outputs sharded, values match the
    single-device dual path."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from uavdet_tpu.inference import make_detector

    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    x0 = jnp.zeros((8, INPUT, INPUT, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    rgb = (rng.uniform(size=(4, 96, 160, 3)) * 255).astype(np.uint8)
    ir = (rng.uniform(size=(4, 48, 64, 3)) * 255).astype(np.uint8)

    det1 = make_detector(model, HP, INPUT, pre_nms_topk=64, max_det=16,
                         compute_dtype=jnp.float32, dual=True)
    d1 = det1(variables, jnp.asarray(rgb), jnp.asarray(ir))

    mesh = make_mesh(n_data=4, n_fsdp=1)
    rep = NamedSharding(mesh, P())
    vars_r = jax.tree.map(lambda v: jax.device_put(v, rep), variables)
    rgb_s = jax.device_put(rgb, NamedSharding(mesh, P("data")))
    ir_s = jax.device_put(ir, NamedSharding(mesh, P("data")))
    det4 = make_detector(model, HP, INPUT, pre_nms_topk=64, max_det=16,
                         compute_dtype=jnp.float32, dual=True, mesh=mesh)
    d4 = det4(vars_r, rgb_s, ir_s)

    assert d4.boxes.shape == (8, 16, 4)  # 2B frames, modality-major
    np.testing.assert_array_equal(np.asarray(d1.valid), np.asarray(d4.valid))
    np.testing.assert_allclose(np.asarray(d1.boxes), np.asarray(d4.boxes),
                               rtol=1e-5, atol=1e-4)


def test_sp_train_step_matches_single_device(rng):
    """Spatial partitioning (image rows sharded over 'sp') must be a pure
    layout change: one train step agrees with the single-device step, and
    the partitioner exchanges conv halos (collective-permute) instead of
    gathering the frames."""
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    tx = build_optimizer(HP)
    batch = _synthetic_batch(rng, batch=4)

    st1 = init_state(model, tx, jax.random.key(0), INPUT, batch_size=4)
    step1 = make_train_step(model, tx, HP, INPUT)
    st1, m1 = step1(st1, batch)

    mesh = make_mesh(n_data=2, n_fsdp=1, n_sp=4)
    st2 = init_state(model, tx, jax.random.key(0), INPUT, batch_size=4)
    sh = state_shardings(st2, mesh, fsdp=False)
    st2 = jax.tree.map(jax.device_put, st2, sh)
    _, compile_step = make_sharded_train_step(model, tx, HP, INPUT, mesh,
                                              spatial=True)
    step2 = compile_step(st2)
    batch_s = shard_batch(batch, mesh, spatial=True)
    assert "sp" in str(batch_s.image.sharding.spec)

    hlo = step2.lower(st2, batch_s).compile().as_text()
    assert "collective-permute" in hlo  # conv halo exchange really happens

    st2, m2 = step2(st2, batch_s)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-3)
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)


def test_sp_detector_matches_single_device(rng):
    """Row-sharded inference == single-device inference. The input frames
    live H-sharded on the mesh; results come back batch-sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from uavdet_tpu.inference import make_detector
    from uavdet_tpu.parallel import image_sharding

    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    x0 = jnp.zeros((4, INPUT, INPUT, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    imgs = (rng.uniform(size=(4, INPUT, INPUT, 3)) * 255).astype(np.uint8)

    det1 = make_detector(model, HP, INPUT, pre_nms_topk=64, max_det=16,
                         compute_dtype=jnp.float32)
    d1 = det1(variables, jnp.asarray(imgs))

    mesh = make_mesh(n_data=2, n_fsdp=1, n_sp=4)
    vars_r = jax.tree.map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P())), variables)
    imgs_s = jax.device_put(imgs, image_sharding(mesh, spatial=True))
    assert imgs_s.addressable_shards[0].data.shape[1] == INPUT // 4
    det_sp = make_detector(model, HP, INPUT, pre_nms_topk=64, max_det=16,
                           compute_dtype=jnp.float32, mesh=mesh,
                           spatial=True)
    d_sp = det_sp(vars_r, imgs_s)

    np.testing.assert_array_equal(np.asarray(d1.valid), np.asarray(d_sp.valid))
    np.testing.assert_allclose(np.asarray(d1.boxes), np.asarray(d_sp.boxes),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d1.scores),
                               np.asarray(d_sp.scores),
                               rtol=1e-5, atol=1e-6)


def test_sp_dysoem_detector_matches_single_device(rng):
    """The 1280px-workload model family (DySOEM: space-to-depth fronts,
    s2d-as-conv SOEMs) under spatial partitioning — the exact scaling
    case SURVEY §2.6 names (per-chip activation memory ÷ sp)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from uavdet_tpu.inference import make_detector
    from uavdet_tpu.models import DySOEM_SimFPN
    from uavdet_tpu.parallel import image_sharding
    from tests.test_dysoem_training import HP as DHP

    model = DySOEM_SimFPN()
    size = 64
    x0 = jnp.zeros((2, size, size, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    imgs = (rng.uniform(size=(2, size, size, 3)) * 255).astype(np.uint8)

    det1 = make_detector(model, DHP, size, pre_nms_topk=64, max_det=16,
                         compute_dtype=jnp.float32)
    d1 = det1(variables, jnp.asarray(imgs))

    mesh = make_mesh(n_data=2, n_fsdp=1, n_sp=4)
    vars_r = jax.tree.map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P())), variables)
    imgs_s = jax.device_put(imgs, image_sharding(mesh, spatial=True))
    det_sp = make_detector(model, DHP, size, pre_nms_topk=64, max_det=16,
                           compute_dtype=jnp.float32, mesh=mesh,
                           spatial=True)
    d_sp = det_sp(vars_r, imgs_s)

    np.testing.assert_array_equal(np.asarray(d1.valid), np.asarray(d_sp.valid))
    np.testing.assert_allclose(np.asarray(d1.boxes), np.asarray(d_sp.boxes),
                               rtol=1e-5, atol=1e-4)


def test_ep_train_step_matches_single_device(rng):
    """Expert parallelism: the stacked expert kernels (DyConv's
    ``experts`` param, E=4 experts on the output-channel axis) shard over
    'ep'; each device computes a slice of the expert convs and the
    attention contraction psums. One step agrees with single-device."""
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    tx = build_optimizer(HP)
    batch = _synthetic_batch(rng, batch=4)

    st1 = init_state(model, tx, jax.random.key(0), INPUT, batch_size=4)
    step1 = make_train_step(model, tx, HP, INPUT)
    st1, m1 = step1(st1, batch)

    mesh = make_mesh(n_data=2, n_fsdp=1, n_sp=1, n_ep=2)
    st2 = init_state(model, tx, jax.random.key(0), INPUT, batch_size=4)
    sh = state_shardings(st2, mesh, ep=True)
    st2 = jax.tree.map(jax.device_put, st2, sh)

    # every DyConv experts kernel is REALLY sharded: half the stacked
    # channels per ep-shard, in params AND in the optimizer trace
    def _ep_leaves(tree):
        return [v for p, v in jax.tree_util.tree_leaves_with_path(tree)
                if any("experts" in str(getattr(k, "key", k)) for k in p)]
    for tree in (st2.params, st2.opt_state):
        leaves = _ep_leaves(tree)
        assert leaves, "no experts leaves found"
        for v in leaves:
            if not hasattr(v, "sharding"):
                continue
            assert "ep" in str(v.sharding.spec), v.sharding
            assert (v.addressable_shards[0].data.shape[-1]
                    == v.shape[-1] // 2)

    _, compile_step = make_sharded_train_step(model, tx, HP, INPUT, mesh,
                                              ep=True)
    st2, m2 = compile_step(st2)(st2, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-3)
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)


def test_ep_dysoem_step_runs_odd_expert_count(rng):
    """DySOEM has E=3 experts; ep=3 gives one whole expert per shard (and
    the stacked axis shards correctly even when ep doesn't divide E —
    it's a plain channel axis). Loss must match single-device."""
    from uavdet_tpu.models import DySOEM_SimFPN
    from tests.test_dysoem_training import HP as DHP

    model = DySOEM_SimFPN()
    tx = build_optimizer(DHP)
    size = 64
    batch = _synthetic_batch(rng, batch=3)

    st1 = init_state(model, tx, jax.random.key(0), size, batch_size=3)
    step1 = make_train_step(model, tx, DHP, size)
    st1, m1 = step1(st1, batch)

    mesh = make_mesh(n_data=1, n_fsdp=1, n_sp=1, n_ep=3)  # uses 3 of 8
    st2 = init_state(model, tx, jax.random.key(0), size, batch_size=3)
    sh = state_shardings(st2, mesh, ep=True)
    st2 = jax.tree.map(jax.device_put, st2, sh)
    n_ep_sharded = sum(
        1 for v in jax.tree.leaves(st2.params)
        if getattr(v.sharding, "spec", None) and "ep" in str(v.sharding.spec))
    assert n_ep_sharded > 0
    _, compile_step = make_sharded_train_step(model, tx, DHP, size, mesh,
                                              ep=True)
    st2, m2 = compile_step(st2)(st2, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-3)


def test_all_axes_combined_step_matches_single_device(rng):
    """Every mesh axis ≥2 at once — data-group(fsdp)=2 × sp=2 × ep=2 on 8
    devices: the batch shards over the ZeRO group (data×fsdp×ep), frames
    are row-sharded, expert kernels EP-sharded, in ONE program. One step
    agrees with single-device (the capstone composition check). FSDP
    *param sharding* is deliberately off — combined with 'sp' it trips a
    measured XLA GSPMD miscompilation (scripts/gspmd_fsdp_sp_repro.py);
    the fsdp axis still carries batch shards."""
    import pytest

    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    tx = build_optimizer(HP)
    batch = _synthetic_batch(rng, batch=4)

    st1 = init_state(model, tx, jax.random.key(0), INPUT, batch_size=4)
    step1 = make_train_step(model, tx, HP, INPUT)
    st1, m1 = step1(st1, batch)

    mesh = make_mesh(n_data=1, n_fsdp=2, n_sp=2, n_ep=2)
    st2 = init_state(model, tx, jax.random.key(0), INPUT, batch_size=4)
    sh = state_shardings(st2, mesh, fsdp=False, ep=True)
    st2 = jax.tree.map(jax.device_put, st2, sh)
    specs = {str(v.sharding.spec) for v in jax.tree.leaves(st2.params)
             if hasattr(v, "sharding")}
    assert any("ep" in s for s in specs)

    _, compile_step = make_sharded_train_step(
        model, tx, HP, INPUT, mesh, fsdp=False, spatial=True, ep=True)
    st2, m2 = compile_step(st2)(st2, shard_batch(batch, mesh, spatial=True))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-3)
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)

    # the unsupported composition is rejected loudly, not silently wrong
    with pytest.raises(ValueError, match="GSPMD"):
        make_sharded_train_step(model, tx, HP, INPUT, mesh,
                                fsdp=True, spatial=True)


def test_sp_ep_grads_exact_at_f64(rng):
    """f64 gradient parity for the sp×ep layout on a config exercising
    BOTH DyConv variants (3×3 stacked-expert conv+contraction AND the
    1×1 mix-first einsum). Rationale: f32 parity at loose tolerance can
    hide real GSPMD miscompilations behind reassociation noise — the two
    bugs fixed in parallel/mesh.py (BATCH_AXES grouping, fsdp×sp
    rejection) produced matching losses and only f64 gradient parity
    separated bug from noise (scripts/gspmd_fsdp_sp_repro.py). The model
    must be built with dtype=f64: the layers' compute dtype defaults to
    f32 regardless of x64 mode."""
    import jax.numpy as jnp
    from uavdet_tpu.ops.losses import yolo_loss
    from uavdet_tpu.ops.targets import encode_yolo_targets
    from uavdet_tpu.parallel.mesh import batch_shardings
    from uavdet_tpu.training.steps import _loss_weights

    cfg = TINY_DY_CONFIG[:2] + (("DyConv", 16, 1, 1),) + TINY_DY_CONFIG[2:]
    with jax.enable_x64(True):
        model = DyYOLO(layer_config=cfg, dtype=jnp.float64)
        tx = build_optimizer(HP)
        cast = (lambda v: v.astype(jnp.float64) if hasattr(v, "dtype")
                and jnp.issubdtype(v.dtype, jnp.floating) else v)
        batch = jax.tree.map(cast, _synthetic_batch(rng, batch=4))
        st = jax.tree.map(cast, init_state(
            model, tx, jax.random.key(0), INPUT, batch_size=4))
        anchors = np.asarray(HP.anchors, np.float64)
        weights = _loss_weights(HP)

        def loss_fn(params, batch_stats, b):
            outs, _ = model.apply(
                {"params": params, "batch_stats": batch_stats}, b.image,
                train=True, mutable=["batch_stats"])
            scales = tuple(INPUT // o.obj.shape[2] for o in outs)
            grids = encode_yolo_targets(b.boxes, b.box_mask, anchors,
                                        scales, INPUT)
            return yolo_loss(outs, grids, anchors, scales, **weights).total

        g1 = jax.jit(jax.grad(loss_fn))(st.params, st.batch_stats, batch)

        mesh = make_mesh(n_data=2, n_fsdp=1, n_sp=2, n_ep=2)
        sh = state_shardings(st, mesh, ep=True)
        st2 = jax.tree.map(jax.device_put, st, sh)
        g2 = jax.jit(jax.grad(loss_fn),
                     in_shardings=(sh.params, sh.batch_stats,
                                   batch_shardings(mesh, spatial=True)))(
            st2.params, st2.batch_stats,
            shard_batch(batch, mesh, spatial=True))

        for (p, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g1),
                                  jax.tree_util.tree_leaves_with_path(g2)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(float(np.max(np.abs(a))), 1e-9)
            assert float(np.max(np.abs(a - b))) / scale < 1e-6, \
                f"{jax.tree_util.keystr(p)}: rel diff exceeds f64 noise"


def test_fsdp_step_runs(rng):
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    tx = build_optimizer(HP)
    mesh = make_mesh(n_data=4, n_fsdp=2)
    st = init_state(model, tx, jax.random.key(0), INPUT, batch_size=8)
    sh = state_shardings(st, mesh, fsdp=True)
    st = jax.tree.map(jax.device_put, st, sh)
    _, compile_step = make_sharded_train_step(model, tx, HP, INPUT, mesh,
                                              fsdp=True)
    batch = shard_batch(_synthetic_batch(rng, batch=8), mesh)
    st, m = compile_step(st)(st, batch)
    assert np.isfinite(float(m["loss"]))
    # at least one parameter leaf actually sharded over fsdp
    n_sharded = sum(
        1 for v in jax.tree.leaves(st.params)
        if getattr(v.sharding, "spec", None) and "fsdp" in str(v.sharding.spec))
    assert n_sharded > 0
