"""Pipeline parallelism ('pp') — collective pipelining over a device ring.

The reference has no pipeline parallelism (SURVEY §2.6: every parallelism
row ABSENT, `devices: 1`); this module is a TPU-native ADDITIVE capability
completing the framework's parallelism matrix (data / fsdp / sp / ep in
``parallel.mesh``, pp here).

Design — the scaling-book collective-pipelining recipe, not a torch
translation:

* The ``layer_config`` token list is split into S contiguous **stages**
  (`split_tokens`, cost-balanced). Each stage is its own flax module
  (`PipelineStage`) whose submodule names reproduce the flagship
  ``YOLOInterpreter`` auto-names (CNNBlock_3, ResidualBlock_1, ...), so a
  flagship checkpoint splits into per-stage trees by plain key selection
  (`PipelinedModel.split_variables`) — value parity is testable and
  checkpoints interchange.
* Inter-stage state is the interpreter's full carry — ``(x, routes, outs)``
  (route stack + detection taps cross stage boundaries). CNN stages have
  HETEROGENEOUS shapes, so the rotating activation buffer is a single
  padded 1-D vector: each boundary's pytree is raveled/concatenated and
  zero-padded to the max boundary size (`_Packer`). This keeps the
  `ppermute` operand one static shape — the XLA-friendly form.
* The pipelined step runs under ``jax.shard_map`` over a 1-axis
  ``('pp',)`` mesh: a `lax.scan` over T = M + S − 1 ticks where each
  device applies ITS stage (`lax.switch` on ``axis_index('pp')``) to its
  current buffer and the buffers rotate one hop per tick with
  ``lax.ppermute`` (ICI neighbour exchange). Device 0 injects microbatch
  t while t < M; device S−1 decodes the head outputs and accumulates the
  loss for microbatch t−(S−1). Gradients come from plain ``jax.grad``
  through the shard_map — ppermute/scan/switch all have exact transpose
  rules, so the backward pass is the reverse pipeline schedule for free.
* **Parameters and BN statistics are genuinely sharded over 'pp'**: each
  stage's tree is raveled and padded into one row of an (S, Pmax) array
  placed with ``PartitionSpec('pp', None)`` — device i stores ONLY stage
  i's weights and optimizer state (`pack_params`). Elementwise optimizers
  (SGD momentum / Adam) act on the packed vector directly; padding lanes
  stay zero because their gradients are identically zero.

Semantics: one pipelined step over M microbatches computes EXACTLY the
sequential microbatch-accumulation step — same per-microbatch BatchNorm
batch statistics (each stage sees microbatches in order), loss = mean over
microbatches, gradient = d(mean loss)/dθ. Verified at float64 against a
single-device sequential oracle (tests/test_pipeline.py).

When to use: NOT for the shipped detectors — their weights are ~27 MB
(every chip holds them for free) and 'data'/'sp' shard the dominant
activations without bubble overhead; ``parallel.mesh`` documents that
recommendation. 'pp' exists for the regimes where it is the right axis
(deep stacked variants, param-heavy models, meshes whose last dimension
has no batch left to split) and to keep the parallelism matrix complete.

Reference being replaced: none (absent upstream) — the NCCL/stage-rank
role a torch pipeline would hand-code is played by XLA collectives over
the mesh.
"""

from functools import partial
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.layers import (
    CNNBlock,
    DyConvModule,
    ResidualBlock,
    ScalePrediction,
    YOLOHead,
    upsample2x,
)
from ..ops.losses import yolo_loss
from ..ops.targets import encode_yolo_targets


# ---------------------------------------------------------------------------
# Stage splitting

def _token_cost(tok) -> float:
    """Rough per-token FLOP weight for balancing stages."""
    if tok[0] == "B":
        return 2.0 * tok[1]
    if tok[0] == "S":
        return 3.0
    if tok[0] == "U":
        return 0.5
    if tok[0] == "DyConv":
        return 1.5
    return 1.0


def split_tokens(layer_config: Sequence, n_stages: int) -> List[Tuple[int, int]]:
    """Partition the token list into ``n_stages`` contiguous, non-empty,
    cost-balanced ranges [(start, end), ...]."""
    n = len(layer_config)
    if not 1 <= n_stages <= n:
        raise ValueError(f"n_stages={n_stages} must be in [1, {n}]")
    costs = [_token_cost(t) for t in layer_config]
    total = sum(costs)
    ranges, start, acc, spent = [], 0, 0.0, 0.0
    for i, c in enumerate(costs):
        acc += c
        remaining_stages = n_stages - len(ranges)
        remaining_tokens = n - i - 1
        target = (total - spent) / remaining_stages
        # close the stage when its cost reaches the fair share — or when
        # every remaining stage needs exactly one of the remaining tokens
        # (keeps all stages non-empty by construction)
        if remaining_stages > 1 and remaining_tokens >= remaining_stages - 1 \
                and (acc >= target
                     or remaining_tokens == remaining_stages - 1):
            ranges.append((start, i + 1))
            start, spent, acc = i + 1, spent + acc, 0.0
    ranges.append((start, n))
    assert len(ranges) == n_stages
    return ranges


def _stage_start_counts(layer_config: Sequence,
                        ranges: Sequence[Tuple[int, int]]):
    """Per-stage starting indices of the flagship interpreter's per-class
    auto-name counters (ResidualBlock_i, CNNBlock_i, ScalePrediction_i,
    DyConvModule_i) so stage submodule names match ``YOLOInterpreter``'s."""
    counts, out = [0, 0, 0, 0], []
    starts = {s for s, _ in ranges}
    for i, tok in enumerate(layer_config):
        if i in starts:
            out.append(tuple(counts))
        if tok[0] == "B":
            counts[0] += 1
        elif tok[0] == "S":
            counts[0] += 1
            counts[1] += 1
            counts[2] += 1
        elif tok[0] == "U":
            pass
        elif tok[0] == "DyConv":
            counts[3] += 1
        else:
            counts[1] += 1
    return out


def _freeze(tok):
    return tuple(tok) if isinstance(tok, (list, tuple)) else tok


# ---------------------------------------------------------------------------
# Stage module

class PipelineStage(nn.Module):
    """A contiguous slice of the ``layer_config`` interpreter
    (models/interpreter.py) operating on the carried ``(x, routes, outs)``
    state. Submodules carry the flagship's global auto-names (via
    ``start_counts``) so parameter trees are key-compatible subsets of the
    full ``YOLOInterpreter`` tree. The last stage applies the shared
    ``yolo_head`` and returns the tuple of DetectionResults."""

    tokens: Tuple[Any, ...]
    start_counts: Tuple[int, int, int, int]
    is_last: bool = False
    n_anchors: int = 3
    attn_temperature: float = 30.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, routes=(), outs=(), train: bool = False):
        dtype = self.dtype or jnp.float32
        rb, cnn, sp, dc = self.start_counts
        routes, outs = list(routes), list(outs)
        x = x.astype(dtype)
        for tok in self.tokens:
            if tok[0] == "B":
                n = tok[1]
                x = ResidualBlock(x.shape[-1], num_repeats=n, dtype=dtype,
                                  name=f"ResidualBlock_{rb}")(x, train)
                rb += 1
                if n == 8:
                    routes.append(x)
            elif tok[0] == "S":
                x = ResidualBlock(x.shape[-1], use_residual=False,
                                  num_repeats=1, dtype=dtype,
                                  name=f"ResidualBlock_{rb}")(x, train)
                rb += 1
                x = CNNBlock(x.shape[-1] // 2, kernel_size=(1, 1),
                             dtype=dtype, name=f"CNNBlock_{cnn}")(x, train)
                cnn += 1
                outs.append(ScalePrediction(
                    x.shape[-1], dtype=dtype,
                    name=f"ScalePrediction_{sp}")(x, train))
                sp += 1
            elif tok[0] == "U":
                x = upsample2x(x)
                x = jnp.concatenate([x, routes.pop()], axis=-1)
            elif tok[0] == "DyConv":
                out_c, k, s = tok[1:]
                x = DyConvModule(out_c, kernel_size=k, stride=s,
                                 padding=1 if k == 3 else 0, dtype=dtype,
                                 name=f"DyConvModule_{dc}")(
                    x, self.attn_temperature, train)
                dc += 1
            else:
                out_c, k, s = tok
                x = CNNBlock(out_c, kernel_size=(k, k), stride=(s, s),
                             padding=1 if k == 3 else 0, dtype=dtype,
                             name=f"CNNBlock_{cnn}")(x, train)
                cnn += 1
        if self.is_last:
            return tuple(YOLOHead(self.n_anchors, len(outs), dtype=dtype,
                                  name="yolo_head")(outs))
        return x, tuple(routes), tuple(outs)


# ---------------------------------------------------------------------------
# Flat packed buffers (heterogeneous pytree <-> fixed-size 1-D vector)

class _Packer:
    """Ravel a pytree of arrays into one 1-D vector (and back), with
    zero-padding to a shared max size — the rotating-buffer representation
    that keeps ``ppermute``'s operand a single static shape."""

    def __init__(self, tree):
        leaves, self.treedef = jax.tree.flatten(tree)
        self.shapes = [tuple(l.shape) for l in leaves]
        self.dtypes = [l.dtype for l in leaves]
        self.sizes = [int(np.prod(s)) for s in self.shapes]
        self.size = int(sum(self.sizes))

    def pack(self, tree, n_max: int, dtype) -> jnp.ndarray:
        leaves = jax.tree.leaves(tree)
        vec = jnp.concatenate(
            [jnp.ravel(l).astype(dtype) for l in leaves]) if leaves \
            else jnp.zeros((0,), dtype)
        return jnp.pad(vec, (0, n_max - self.size))

    def unpack(self, vec: jnp.ndarray):
        out, o = [], 0
        for sh, dt, sz in zip(self.shapes, self.dtypes, self.sizes):
            out.append(lax.slice(vec, (o,), (o + sz,)).reshape(sh)
                       .astype(dt))
            o += sz
        return jax.tree.unflatten(self.treedef, out)


# ---------------------------------------------------------------------------
# Staged model container

class PipelinedModel:
    """Builds the S stage modules for a ``layer_config``, owns the boundary
    packers, and converts between the flagship's variable tree and the
    packed per-stage representation."""

    def __init__(self, layer_config: Sequence, n_stages: int,
                 n_anchors: int = 3, attn_temperature: float = 30.0,
                 dtype: Any = None):
        tokens = tuple(_freeze(t) for t in layer_config)
        self.layer_config = tokens
        self.n_stages = n_stages
        self.ranges = split_tokens(tokens, n_stages)
        counts = _stage_start_counts(tokens, self.ranges)
        self.stages = [
            PipelineStage(tokens=tokens[s:e], start_counts=counts[i],
                          is_last=(i == n_stages - 1), n_anchors=n_anchors,
                          attn_temperature=attn_temperature, dtype=dtype)
            for i, (s, e) in enumerate(self.ranges)]
        self._boundaries = None  # list of S+1 pytrees of ShapeDtypeStructs

    # -- initialization / tracing ------------------------------------------
    def init(self, rng, sample_image: jnp.ndarray, train: bool = False):
        """Sequentially initialize every stage on a sample microbatch;
        records the S+1 boundary pytrees. Returns the per-stage variable
        dicts."""
        state, variables = (sample_image, (), ()), []
        bounds = [sample_image]
        for i, stage in enumerate(self.stages):
            r = jax.random.fold_in(rng, i)
            v = stage.init(r, *state, train=train)
            out = stage.apply(v, *state, train=train,
                              **({"mutable": ["batch_stats"]} if train
                                 else {}))
            if train:
                out = out[0]
            variables.append(jax.tree.map(jnp.asarray, v))
            state = out
            bounds.append(out)
        self._boundaries = [jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), b)
            for b in bounds]
        self._stage_keys = [tuple(v["params"].keys()) for v in variables]
        return variables

    @property
    def boundaries(self):
        if self._boundaries is None:
            raise RuntimeError("call init() first")
        return self._boundaries

    # -- flagship checkpoint interop ---------------------------------------
    @staticmethod
    def _descend(col):
        """The flagship models wrap the interpreter in a single 'net'
        submodule (models/dy_yolo.py) — descend into it when present."""
        return col["net"] if set(col.keys()) == {"net"} else col

    @classmethod
    def from_hparams(cls, hparams, n_stages: int,
                     dtype: Any = None) -> "PipelinedModel":
        """Build from a model hparams block (params.yaml `model.hparams`) —
        same fields the registry reads (models/registry.py)."""
        get = (hparams.get if hasattr(hparams, "get")
               else lambda k, d: getattr(hparams, k, d))
        return cls(hparams.layer_config, n_stages,
                   n_anchors=len(hparams.anchors[0]),
                   attn_temperature=float(get("attn_temperature", 30.0)),
                   dtype=dtype)

    def split_variables(self, variables) -> List[dict]:
        """Select each stage's key-subset out of a full ``YOLOInterpreter``
        (or DyYOLO/BaselineModel) variable tree (names match by
        construction). Records whether the tree was 'net'-nested so
        ``to_model_variables`` can invert the split."""
        self._nested = set(variables["params"].keys()) == {"net"}
        params = self._descend(variables["params"])
        stats = self._descend(variables.get("batch_stats", {}))
        out = []
        for keys in self._stage_keys:
            out.append({
                "params": {k: params[k] for k in keys},
                "batch_stats": {k: stats[k] for k in keys if k in stats}})
        return out

    def to_model_variables(self, stage_variables: Sequence[dict]) -> dict:
        """Inverse of ``split_variables``: merge per-stage trees back into
        a flagship-model variable dict (re-nesting under 'net' when the
        split source was nested — the DyYOLO/BaselineModel layout)."""
        v = self.merge_variables(stage_variables)
        if getattr(self, "_nested", False):
            return {"params": {"net": v["params"]},
                    "batch_stats": {"net": v["batch_stats"]}}
        return v

    def merge_variables(self, stage_variables: Sequence[dict]) -> dict:
        params, stats = {}, {}
        for v in stage_variables:
            params.update(v["params"])
            stats.update(v.get("batch_stats", {}))
        return {"params": params, "batch_stats": stats}

    # -- packed representation ---------------------------------------------
    def _param_packers(self, stage_variables):
        pp = [_Packer(v["params"]) for v in stage_variables]
        sp = [_Packer(v.get("batch_stats", {})) for v in stage_variables]
        return pp, sp

    def pack_params(self, stage_variables: Sequence[dict]):
        """(S, Pmax) params + (S, Qmax) batch-stats arrays, one stage per
        row — place with PartitionSpec('pp', None) to shard over the
        pipeline axis."""
        pp, sp = self._param_packers(stage_variables)
        pmax = max(p.size for p in pp)
        qmax = max(max(s.size for s in sp), 1)
        pd = jax.tree.leaves(stage_variables[0]["params"])[0].dtype
        pvec = jnp.stack([p.pack(v["params"], pmax, pd)
                          for p, v in zip(pp, stage_variables)])
        svec = jnp.stack([s.pack(v.get("batch_stats", {}), qmax, pd)
                          for s, v in zip(sp, stage_variables)])
        return pvec, svec

    def unpack_params(self, pvec, svec, stage_variables_like):
        """Inverse of pack_params (needs a same-structured template)."""
        pp, sp = self._param_packers(stage_variables_like)
        out = []
        for i, (p, s) in enumerate(zip(pp, sp)):
            out.append({"params": p.unpack(pvec[i]),
                        "batch_stats": s.unpack(svec[i])})
        return out

    # -- sequential (oracle / single-device) execution ----------------------
    def sequential_apply(self, stage_variables, image, train: bool = False):
        """Run all stages in order on one microbatch. Returns (dets,
        new_stage_variables) — the semantics one pipeline 'wave'
        reproduces."""
        state = (image, (), ())
        new_vars = []
        for stage, v in zip(self.stages, stage_variables):
            if train:
                out, mut = stage.apply(v, *state, train=True,
                                       mutable=["batch_stats"])
                new_vars.append({"params": v["params"],
                                 "batch_stats": mut["batch_stats"]})
            else:
                out = stage.apply(v, *state, train=False)
                new_vars.append(v)
            state = out
        return state, new_vars

    def head_scales(self, input_size: int) -> Tuple[int, ...]:
        dets = self.boundaries[-1]
        return tuple(input_size // o.obj.shape[2] for o in dets)


# ---------------------------------------------------------------------------
# The pipelined step

def make_pp_mesh(n_pp: int, devices=None) -> Mesh:
    """1-axis ('pp',) mesh over the first n_pp devices (ring over ICI)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices[:n_pp]), axis_names=("pp",))


def pp_shardings(mesh: Mesh):
    """(params, stats) NamedShardings: one stage row per pipeline device."""
    row = NamedSharding(mesh, P("pp", None))
    return row, row


def make_pp_loss(pm: PipelinedModel, mesh: Mesh, hparams, input_size: int,
                 n_micro: int, stage_variables_template,
                 compute_dtype=jnp.float32):
    """Build the collectively-pipelined loss:

        loss_fn(pvec, svec, images, boxes, box_mask)
            -> (loss, (new_svec, metrics))

    images: (M, mb, H, W, C) microbatched frames; boxes/box_mask the
    matching (M, mb, N, 4)/(M, mb, N) targets. pvec/svec are the packed
    per-stage params/batch-stats from ``pack_params`` sharded over 'pp';
    ``stage_variables_template`` (e.g. the trees from ``init`` or
    ``split_variables``) supplies the static unpack metadata.
    Differentiable wrt pvec (jax.grad runs the reverse pipeline)."""
    from ..training.steps import _loss_weights

    S = pm.n_stages
    M = n_micro
    if dict(mesh.shape).get("pp") != S:
        raise ValueError(f"mesh pp axis {dict(mesh.shape)} != {S} stages")
    anchors = np.asarray(hparams.anchors, np.dtype(compute_dtype))
    weights = _loss_weights(hparams)
    scales = pm.head_scales(input_size)

    bpack = [_Packer(b) for b in pm.boundaries]
    n_max = max(p.size for p in bpack)
    out_packer = bpack[-1]

    # packers over the published param layout (built from shape structs via
    # an un-initialized template is impossible — callers pass real packed
    # arrays, so sizes come from the boundary trace + stage key template)
    def _branch(i, psizes, ssizes, punpack, sunpack):
        def br(buf, pvec_l, svec_l):
            params = punpack[i](lax.slice(pvec_l, (0, 0),
                                          (1, psizes[i]))[0])
            stats = sunpack[i](lax.slice(svec_l, (0, 0),
                                         (1, max(ssizes[i], 1)))[0]
                               [:ssizes[i]])
            st_in = bpack[i].unpack(buf)
            # boundary 0 is the bare image array; later boundaries are the
            # (x, routes, outs) carry tuple
            args = (st_in, (), ()) if i == 0 else st_in
            out, mut = pm.stages[i].apply(
                {"params": params, "batch_stats": stats}, *args,
                train=True, mutable=["batch_stats"])
            new_buf = bpack[i + 1].pack(out, n_max, compute_dtype)
            packed = _Packer(mut["batch_stats"]).pack(
                mut["batch_stats"], svec_l.shape[1], svec_l.dtype)
            return new_buf, packed[None, :]
        return br

    pp_, sp_ = pm._param_packers(stage_variables_template)
    psizes = [p.size for p in pp_]
    ssizes = [s.size for s in sp_]
    punpack = [p.unpack for p in pp_]
    sunpack = [s.unpack for s in sp_]
    branches = [_branch(i, psizes, ssizes, punpack, sunpack)
                for i in range(S)]

    def body(pvec, svec, images, boxes, mask):
        # local shapes: pvec (1, Pmax), svec (1, Qmax); data replicated
        s = lax.axis_index("pp")
        T = M + S - 1

        def tick(carry, t):
            buf, sv, acc = carry
            m_in = jnp.clip(t, 0, M - 1)
            img = lax.dynamic_index_in_dim(
                images, m_in, 0, keepdims=False).astype(compute_dtype)
            inj = bpack[0].pack(img, n_max, compute_dtype)
            buf = jnp.where((s == 0) & (t < M), inj, buf)

            new_buf, new_sv = lax.switch(s, branches, buf, pvec, sv)
            active = (t >= s) & ((t - s) < M)
            sv = jnp.where(active, new_sv, sv)

            # harvest loss on the last stage
            mh = jnp.clip(t - (S - 1), 0, M - 1)
            dets = out_packer.unpack(new_buf)
            bx = lax.dynamic_index_in_dim(boxes, mh, 0, keepdims=False)
            mk = lax.dynamic_index_in_dim(mask, mh, 0, keepdims=False)
            grids = encode_yolo_targets(bx, mk, anchors, scales,
                                        input_size)
            lb = yolo_loss(list(dets), grids, anchors, scales, **weights)
            # SELECT the harvested value (not mask-multiply): on the S-1
            # non-harvest devices yolo_loss runs on a reinterpreted
            # activation buffer, and 0 * inf/nan would poison the psum
            harvest = (s == S - 1) & active
            acc = jax.tree.map(
                lambda a, v: a + jnp.where(harvest, v, 0.0).astype(a.dtype),
                acc, (lb.total, lb.bbox, lb.obj))

            buf = lax.ppermute(new_buf, "pp",
                               [(i, i + 1) for i in range(S - 1)])
            return (buf, sv, acc), None

        # the buffer/accumulator carries start as constants but become
        # device-varying inside the scan — mark them pp-varying up front
        # (jax 0.9 shard_map VMA rule)
        vary = (lambda v: lax.pcast(v, ("pp",), to="varying")) \
            if hasattr(lax, "pcast") else (lambda v: lax.pvary(v, ("pp",)))
        z = vary(jnp.zeros((), compute_dtype))
        (buf, sv, acc), _ = lax.scan(
            tick,
            (vary(jnp.zeros((n_max,), compute_dtype)), svec, (z, z, z)),
            jnp.arange(T))
        total, bbox, obj = [lax.psum(a, "pp") / M for a in acc]
        return total, sv, {"bbox_loss": bbox, "obj_loss": obj}

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("pp", None), P("pp", None), P(), P(), P()),
        out_specs=(P(), P("pp", None), P()))

    def loss_fn(pvec, svec, images, boxes, mask):
        total, new_svec, extra = mapped(pvec, svec, images, boxes, mask)
        return total, (new_svec, dict(extra, loss=total))

    return loss_fn


def make_pp_train_step(pm: PipelinedModel, mesh: Mesh, tx, hparams,
                       input_size: int, n_micro: int,
                       stage_variables_template,
                       compute_dtype=jnp.float32):
    """Jitted pipelined training step over the packed state:

        step((pvec, svec, opt_state), images, boxes, mask)
            -> ((pvec', svec', opt_state'), metrics)

    The optimizer acts elementwise on the packed (S, Pmax) array — padding
    lanes have identically-zero gradients so SGD-momentum/Adam leave them
    zero. pvec/svec/opt_state live sharded over 'pp' (one stage per
    device)."""
    import optax

    loss_fn = make_pp_loss(pm, mesh, hparams, input_size, n_micro,
                           stage_variables_template, compute_dtype)

    def step(state, images, boxes, mask):
        pvec, svec, opt_state = state
        (_, (new_svec, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(pvec, svec, images, boxes, mask)
        updates, new_opt = tx.update(grads, opt_state, pvec)
        new_pvec = optax.apply_updates(pvec, updates)
        return (new_pvec, new_svec, new_opt), metrics

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Trainer-facing surface (train.trainer.pp_devices)

def pp_state_shardings(state, mesh: Mesh):
    """NamedShardings for a PACKED pp TrainState: every (S, X) leaf (packed
    params / batch-stats / elementwise optimizer state) lives one stage
    row per device; scalars (step counters, MultiSteps counts) replicate."""
    S = dict(mesh.shape)["pp"]
    row = NamedSharding(mesh, P("pp", None))
    rep = NamedSharding(mesh, P())

    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 2 and leaf.shape[0] == S:
            return row
        return rep

    return jax.tree.map(spec, state)


def make_pp_trainer_step(pm: PipelinedModel, mesh: Mesh, tx, hparams,
                         input_size: int, n_micro: int,
                         stage_variables_template,
                         compute_dtype=jnp.float32):
    """The Trainer-shaped pipelined step: ``(TrainState, BatchData) ->
    (TrainState, metrics)`` where the TrainState holds the PACKED
    representation (params=(S, Pmax) pvec, batch_stats=(S, Qmax) svec).
    Each incoming batch is split into ``n_micro`` microbatches along the
    batch dim and streamed through the pipeline (loss = mean over
    microbatches — the collective-pipelining schedule)."""
    import optax

    loss_fn = make_pp_loss(pm, mesh, hparams, input_size, n_micro,
                           stage_variables_template, compute_dtype)

    def step(state, batch):
        b = batch.image.shape[0]
        mb = b // n_micro
        imgs = batch.image.astype(compute_dtype).reshape(
            n_micro, mb, *batch.image.shape[1:])
        boxes = batch.boxes.reshape(n_micro, mb, *batch.boxes.shape[1:])
        mask = batch.box_mask.reshape(n_micro, mb,
                                      *batch.box_mask.shape[1:])
        (_, (new_svec, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   imgs, boxes, mask)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_pvec = optax.apply_updates(state.params, updates)
        from ..utils.datatypes import TrainState
        return TrainState(params=new_pvec, batch_stats=new_svec,
                          opt_state=new_opt, step=state.step + 1), metrics

    return jax.jit(step)


def make_pp_eval_step(pm: PipelinedModel, model, hparams, input_size: int,
                      stage_variables_template, compute_dtype=jnp.float32):
    """Eval step over the packed pp state: unpacks the (S, Pmax)/(S, Qmax)
    rows back into flagship variables inside the jitted program (XLA
    gathers the stage rows once) and reuses the standard eval loss."""
    from ..training.steps import make_eval_step
    from ..utils.datatypes import TrainState

    base = make_eval_step(model, hparams, input_size, compute_dtype)

    @jax.jit
    def eval_step(state, batch):
        svars = pm.unpack_params(state.params, state.batch_stats,
                                 stage_variables_template)
        v = pm.to_model_variables(svars)
        st = TrainState(params=v["params"], batch_stats=v["batch_stats"],
                        opt_state=None, step=state.step)
        return base(st, batch)

    return eval_step
