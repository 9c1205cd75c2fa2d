"""Pipeline parallelism ('pp') tests on the virtual CPU mesh.

Validates, in order of strength:
1. the stage splitter partitions any config into non-empty contiguous
   ranges;
2. a flagship ``DyYOLO`` variable tree splits into per-stage subsets whose
   staged-sequential execution reproduces the flagship forward exactly
   (key-compatible naming + identical op sequence);
3. **f64 gradient parity**: one collectively-pipelined step over M
   microbatches equals the single-device sequential microbatch-accumulation
   oracle — loss, loss components, gradients, and updated BN statistics
   (the same only-trustworthy-at-f64 methodology as
   test_sp_ep_grads_exact_at_f64);
4. the packed pp train step runs sharded over a ('pp',) mesh, params are
   genuinely placed one-stage-per-device, and one SGD step matches the
   oracle's update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from uavdet_tpu.models import DyYOLO
from uavdet_tpu.parallel.pipeline import (
    PipelinedModel,
    make_pp_loss,
    make_pp_mesh,
    make_pp_train_step,
    pp_shardings,
    split_tokens,
)
from uavdet_tpu.training import build_optimizer
from tests.test_models import TINY_DY_CONFIG
from tests.test_train_step import HP, INPUT, _synthetic_batch

MB, M, S = 2, 3, 4  # microbatch rows, microbatches, pipeline stages


def _microbatches(rng, dtype=jnp.float32):
    b = _synthetic_batch(rng, batch=MB * M)
    cast = lambda v: (v.astype(dtype)
                      if jnp.issubdtype(v.dtype, jnp.floating) else v)
    imgs = cast(b.image).reshape(M, MB, INPUT, INPUT, 3)
    boxes = cast(b.boxes).reshape(M, MB, -1, 4)
    mask = b.box_mask.reshape(M, MB, -1)
    return imgs, boxes, mask


def test_split_tokens_partitions():
    for n in (1, 2, 4, 7, len(TINY_DY_CONFIG)):
        ranges = split_tokens(TINY_DY_CONFIG, n)
        assert len(ranges) == n
        assert ranges[0][0] == 0 and ranges[-1][1] == len(TINY_DY_CONFIG)
        for (a, b), (c, d) in zip(ranges, ranges[1:]):
            assert b == c and a < b and c < d


def test_staged_forward_matches_flagship(rng):
    """split_variables(flagship) + sequential staged execution reproduces
    the flagship interpreter's forward (same modules, same names, same op
    order)."""
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    x = jnp.asarray(rng.uniform(size=(MB, INPUT, INPUT, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)

    pm = PipelinedModel(TINY_DY_CONFIG, S)
    pm.init(jax.random.key(1), x)  # records boundaries + stage key sets
    stage_vars = pm.split_variables(variables)

    # the stage key subsets exactly tile the flagship tree
    all_keys = [k for v in stage_vars for k in v["params"]]
    assert sorted(all_keys) == sorted(variables["params"]["net"].keys())

    ref = model.apply(variables, x, train=False)
    dets, _ = pm.sequential_apply(stage_vars, x, train=False)
    assert len(dets) == len(ref)
    for d, r in zip(dets, ref):
        np.testing.assert_allclose(np.asarray(d.obj), np.asarray(r.obj),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d.bbox), np.asarray(r.bbox),
                                   rtol=1e-6, atol=1e-6)

    # round-trip through the packed representation is exact
    pvec, svec = pm.pack_params(stage_vars)
    back = pm.unpack_params(pvec, svec, stage_vars)
    for a, b in zip(jax.tree.leaves(stage_vars), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _oracle_loss_fn(pm, template, anchors, weights, scales, input_size):
    """Single-device sequential microbatch accumulation: the semantics the
    pipelined step must reproduce (per-microbatch BN batch stats, stats
    threaded across microbatches in order, loss = mean over microbatches)."""
    from uavdet_tpu.ops.losses import yolo_loss
    from uavdet_tpu.ops.targets import encode_yolo_targets

    def loss_fn(pvec, svec, images, boxes, mask):
        svars = pm.unpack_params(pvec, svec, template)
        total = bbox = obj = 0.0
        for m in range(M):
            state = (images[m], (), ())
            new = []
            for stage, v in zip(pm.stages, svars):
                out, mut = stage.apply(v, *state, train=True,
                                       mutable=["batch_stats"])
                new.append({"params": v["params"],
                            "batch_stats": mut["batch_stats"]})
                state = out
            svars = new
            grids = encode_yolo_targets(boxes[m], mask[m], anchors, scales,
                                        input_size)
            lb = yolo_loss(list(state), grids, anchors, scales, **weights)
            total, bbox, obj = total + lb.total, bbox + lb.bbox, obj + lb.obj
        _, new_svec = pm.pack_params(svars)
        return total / M, (new_svec, {"bbox_loss": bbox / M,
                                      "obj_loss": obj / M})

    return loss_fn


def test_pipeline_matches_sequential_oracle_f64(rng):
    """f64 loss + gradient + BN-statistics parity: the pipelined schedule
    (inject/rotate/harvest over M+S-1 ticks) computes exactly the
    sequential microbatch-accumulation step. f32 'agreement' can hide
    schedule bugs behind reassociation noise — f64 separates them."""
    from uavdet_tpu.training.steps import _loss_weights

    with jax.enable_x64(True):
        pm = PipelinedModel(TINY_DY_CONFIG, S, dtype=jnp.float64)
        imgs, boxes, mask = _microbatches(rng, jnp.float64)
        template = pm.init(jax.random.key(2), imgs[0])
        template = jax.tree.map(
            lambda v: v.astype(jnp.float64)
            if jnp.issubdtype(v.dtype, jnp.floating) else v, template)
        pvec, svec = pm.pack_params(template)

        anchors = np.asarray(HP.anchors, np.float64)
        weights = _loss_weights(HP)
        scales = pm.head_scales(INPUT)

        oracle = _oracle_loss_fn(pm, template, anchors, weights, scales,
                                 INPUT)
        (l1, (sv1, m1)), g1 = jax.jit(jax.value_and_grad(
            oracle, has_aux=True))(pvec, svec, imgs, boxes, mask)

        mesh = make_pp_mesh(S)
        pp_loss = make_pp_loss(pm, mesh, HP, INPUT, M, template,
                               compute_dtype=jnp.float64)
        row, _ = pp_shardings(mesh)
        pvec2, svec2 = jax.device_put(pvec, row), jax.device_put(svec, row)
        (l2, (sv2, m2)), g2 = jax.jit(jax.value_and_grad(
            pp_loss, has_aux=True))(pvec2, svec2, imgs, boxes, mask)

        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-12)
        for k in ("bbox_loss", "obj_loss"):
            np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                       rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(sv1), np.asarray(sv2),
                                   rtol=1e-9, atol=1e-12)


def test_pp_train_step_sharded_f64(rng):
    """The packed pp train step runs with params placed one-stage-per-device
    over the ('pp',) mesh and its SGD update matches the oracle's.

    Update parity is asserted at f64 — the repo's discrimination lesson
    (CLAUDE.md): f32 'divergence' up to ~5e-2 can be pure reassociation
    noise on this model, so an f32 update comparison cannot separate a
    schedule bug from noise. f64 can (rtol 1e-9)."""
    import optax

    with jax.enable_x64(True):
        pm = PipelinedModel(TINY_DY_CONFIG, S, dtype=jnp.float64)
        imgs, boxes, mask = _microbatches(rng, jnp.float64)
        template = pm.init(jax.random.key(3), imgs[0])
        template = jax.tree.map(
            lambda v: v.astype(jnp.float64)
            if jnp.issubdtype(v.dtype, jnp.floating) else v, template)
        pvec, svec = pm.pack_params(template)

        tx = build_optimizer(HP)
        mesh = make_pp_mesh(S)
        row, _ = pp_shardings(mesh)
        pvec_s = jax.device_put(pvec, row)
        svec_s = jax.device_put(svec, row)
        opt = jax.device_put(tx.init(pvec), jax.tree.map(lambda _: row,
                                                         tx.init(pvec)))
        # genuinely sharded: each device holds exactly one stage row
        assert pvec_s.sharding.is_equivalent_to(row, pvec_s.ndim)
        shard_shapes = {tuple(s.data.shape)
                        for s in pvec_s.addressable_shards}
        assert shard_shapes == {(1, pvec.shape[1])}

        step = make_pp_train_step(pm, mesh, tx, HP, INPUT, M, template,
                                  compute_dtype=jnp.float64)
        (pvec2, svec2, opt2), metrics = step((pvec_s, svec_s, opt),
                                             imgs, boxes, mask)
        assert np.isfinite(float(metrics["loss"]))

        # oracle SGD step on the same packed state
        from uavdet_tpu.training.steps import _loss_weights
        anchors = np.asarray(HP.anchors, np.float64)
        oracle = _oracle_loss_fn(pm, template, anchors, _loss_weights(HP),
                                 pm.head_scales(INPUT), INPUT)
        (_, _), g1 = jax.jit(jax.value_and_grad(oracle, has_aux=True))(
            pvec, svec, imgs, boxes, mask)
        updates, _ = tx.update(g1, tx.init(pvec), pvec)
        ref = optax.apply_updates(pvec, updates)
        np.testing.assert_allclose(np.asarray(pvec2), np.asarray(ref),
                                   rtol=1e-9, atol=1e-12)

        # padding lanes never move (their grads are identically zero)
        sizes = [p.size for p in pm._param_packers(template)[0]]
        for i, sz in enumerate(sizes):
            np.testing.assert_array_equal(np.asarray(pvec2)[i, sz:], 0.0)


def test_pp_train_step_f32_smoke(rng):
    """The production-precision (f32) pp train step dispatches sharded and
    produces finite metrics — parity itself is asserted by the f64 tests
    (f32 comparisons cannot discriminate; CLAUDE.md methodology note)."""
    pm = PipelinedModel(TINY_DY_CONFIG, S)
    imgs, boxes, mask = _microbatches(rng)
    template = pm.init(jax.random.key(4), imgs[0])
    pvec, svec = pm.pack_params(template)

    tx = build_optimizer(HP)
    mesh = make_pp_mesh(S)
    row, _ = pp_shardings(mesh)
    state = (jax.device_put(pvec, row), jax.device_put(svec, row),
             jax.device_put(tx.init(pvec),
                            jax.tree.map(lambda _: row, tx.init(pvec))))
    step = make_pp_train_step(pm, mesh, tx, HP, INPUT, M, template)
    (pvec2, _, _), metrics = step(state, imgs, boxes, mask)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(np.asarray(pvec2)).all()
