"""End-to-end jitted inference: preproc → forward → decode → NMS.

This is the BASELINE.json north-star pipeline (fps/chip at 640px). The
whole chain is ONE jitted XLA program with static shapes:

  1. preprocess: uint8 frames → resize (bilinear) → [0,1] float → compute
     dtype (bf16 on TPU),
  2. model forward (flax apply, batch_stats frozen),
  3. decode every head to absolute-pixel xyxy + sigmoid scores
     (reference model/_base.py:214-248; in 'mse' mode the reference's AP
     path never adds grid/anchor terms — here absolute boxes are produced
     for BOTH modes, since cell-relative boxes are meaningless for NMS),
  4. per-image top-k candidate pre-selection (static K) and greedy NMS at
     IoU 0.5 (reference :203), keeping max_det=300 (utils/metrics.py:97).
"""

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ops.decode import decode_predictions
from .ops.resize import bilinear_resize
from .ops.nms import nms


class Detections(NamedTuple):
    """Fixed-shape detection results; invalid slots have score == 0 and
    box == 0."""

    boxes: jnp.ndarray   # (B, max_det, 4) xyxy pixels
    scores: jnp.ndarray  # (B, max_det)
    valid: jnp.ndarray   # (B, max_det) bool


def preprocess(images: jnp.ndarray, input_size: int,
               compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8/float NHWC frames → (B, S, S, C) in [0,1], compute dtype.

    Replaces the reference's host-side albumentations Resize+ToFloat
    (prepare_dataloader.py:20-24) with an on-device op that XLA fuses into
    the first conv's input pipeline. The resize runs as two separable
    matmuls against precomputed bilinear weight matrices (ops/resize.py)
    instead of
    ``jax.image.resize``: the triangle kernels touch ≤5 input rows/cols
    per output, but XLA's gather-based lowering of resize measures 4.3 ms
    for 8×1080p→640² on v5e where the MXU form takes 1.9 ms (PERF.md r3).
    Numerics match jax.image.resize to matmul precision (bitwise-shape of
    the kernel is identical; on TPU both round through the default bf16
    matmul precision anyway).
    """
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    x = bilinear_resize(x, input_size, input_size)
    return x.astype(compute_dtype)


def preprocess_dual(rgb: jnp.ndarray, ir: jnp.ndarray, input_size: int,
                    compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Cross-modality alignment preprocessing, fused on device.

    Anti-UAV-RGBT streams come at different native resolutions (RGB
    1920×1080, IR 640×512). The reference resizes each modality on the host
    and feeds them as separate samples (AntiUAVDataset.py:110-123,
    :56-68). Here both streams are aligned to the common detector grid in
    ONE jitted program — resize (bilinear) + [0,1] normalize + dtype cast —
    and stacked modality-major into a single (2B, S, S, 3) batch:
    out[:B] = RGB frames, out[B:] = IR frames.
    """
    r = preprocess(rgb, input_size, compute_dtype)
    i = preprocess(ir, input_size, compute_dtype)
    return jnp.concatenate([r, i], axis=0)


def decode_all_heads(outs, anchors: np.ndarray, head_scales: Sequence[int],
                     bbox_loss_fn: str = "mse"):
    """Flatten per-head predictions to absolute-pixel xyxy + scores.

    → boxes (B, N, 4), scores (B, N) with N = Σ_h A·S_h²."""
    all_boxes, all_scores = [], []
    for h, out in enumerate(outs):
        scale = head_scales[h]
        sa = jnp.asarray(anchors[h], jnp.float32) / scale  # grid units
        p = out.bbox.astype(jnp.float32)
        dec = decode_predictions(p, sa, bbox_loss_fn)  # cxcywh
        if bbox_loss_fn != "ciou":
            # add the grid/anchor terms ('ciou' decode already has them)
            hh, ww = p.shape[-3], p.shape[-2]
            gx = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 1)
            gy = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 0)
            dec = jnp.stack([
                dec[..., 0] + gx,
                dec[..., 1] + gy,
                dec[..., 2] * sa[:, None, None, 0],
                dec[..., 3] * sa[:, None, None, 1],
            ], axis=-1)
        dec = dec * scale  # grid units → pixels
        cx, cy, w_, h_ = (dec[..., i] for i in range(4))
        boxes = jnp.stack([cx - w_ / 2, cy - h_ / 2,
                           cx + w_ / 2, cy + h_ / 2], axis=-1)
        b = boxes.shape[0]
        all_boxes.append(boxes.reshape(b, -1, 4))
        all_scores.append(
            jax.nn.sigmoid(out.obj.astype(jnp.float32)[..., 0]).reshape(
                b, -1))
    return (jnp.concatenate(all_boxes, axis=1),
            jnp.concatenate(all_scores, axis=1))


_TOPK_CHUNK = 16384


def _topk_wide(logits: jnp.ndarray, k: int):
    """``lax.top_k`` over (B, n), two-stage chunked when n is very wide.

    XLA's single top_k at DySOEM-1280 scale (n≈1.6M, B=32) measures
    84.7 ms on v5e; per-chunk top-k then top-k over the m·k survivors
    measures 44.7 ms at chunk=16384. VALUES are provably exact: every
    global top-k element is a top-k element of its own chunk (any
    in-chunk discard loses to ≥k earlier same-chunk elements, which beat
    it globally too), and padding with -inf can only be selected when
    k > n. Tie ORDER (hence indices) is only EMPIRICALLY equal to the
    single sort: bitwise-matched over randomized bf16 trials at the
    integrated shapes, but XLA's top_k tie-stability is shape- AND
    dtype-dependent — violations observed at a 102400-wide second stage,
    and once at m·k=3072 with f32 random data on v5e (equal-VALUE
    candidates swapped; detections differ only in the arbitrary order of
    exact score ties). The guard below keeps the chunked path inside the
    bf16 trial envelope (stage 2 ≤ 51200) and falls back to the single
    sort outside it.
    """
    b, n = logits.shape
    m = -(-n // _TOPK_CHUNK)
    # Guard BOTH ends of the verified domain: chunking only pays off for
    # very wide n, and the stage-2 sort must stay ≤51200 wide (the bound
    # below which the bitwise tie-order trials saw zero violations) or
    # the bitwise-equality guarantee vs the single sort is void.
    if n < 4 * _TOPK_CHUNK or k > _TOPK_CHUNK or m * k > 51200:
        return jax.lax.top_k(logits, k)
    pad = m * _TOPK_CHUNK - n
    xp = jnp.pad(logits, ((0, 0), (0, pad)),
                 constant_values=-jnp.inf) if pad else logits
    v1, i1 = jax.lax.top_k(xp.reshape(b, m, _TOPK_CHUNK), k)
    g1 = (jnp.arange(m, dtype=jnp.int32)[None, :, None] * _TOPK_CHUNK
          + i1).reshape(b, m * k)
    v2, i2 = jax.lax.top_k(v1.reshape(b, m * k), k)
    return v2, jnp.take_along_axis(g1, i2, axis=1)


def decode_topk_heads(outs, anchors: np.ndarray,
                      head_scales: Sequence[int], pre_nms_topk: int,
                      return_logits: bool = False):
    """Per-head top-k on objectness LOGITS, then decode only the survivors.

    Equivalent to ``decode_all_heads`` + per-head top-k on scores (sigmoid
    is strictly monotonic, so ranking logits ranks scores; and any global
    top-k candidate is a top-k candidate of its own head, so the union of
    per-head top-k sets contains the global top-k) — but it never
    materializes decoded boxes for the full grid, which at e.g. DySOEM
    1280px (3·640² candidates on the stride-2 head) is the difference
    between gigabytes of HBM traffic and a few MB.

    Both bbox_loss_fn modes decode to the same absolute-pixel formula
    (reference model/_base.py:214-241 + the mse-mode grid/anchor terms):
      cx = (σ(t0)·2 − 0.5 + gx)·scale,  w = (σ(t2)·2)²·anchor_px.

    → boxes (B, Σ_h k_h, 4) xyxy f32, scores (B, Σ_h k_h) f32; with
    ``return_logits`` also the kept objectness logits in their NATIVE
    dtype (B, Σ_h k_h) — the sort key a second-stage top-k must use to
    stay bitwise-equal to ``decode_topk_global`` (f32 sigmoid saturates
    to exactly 1.0 above logit ≈ 16.6, so re-sorting by SCORE collapses
    distinct high-confidence candidates into ties and reorders them).
    """
    all_b, all_s, all_l = [], [], []
    for h, out in enumerate(outs):
        scale = head_scales[h]
        b, a, hh, ww, _ = out.obj.shape
        n = a * hh * ww
        k = min(pre_nms_topk, n)
        # top-k in the head's native dtype (bf16 on TPU): halves the sort
        # bandwidth. bf16 rounding can only reorder candidates whose
        # logits are within 1 ulp — their scores are equal to far beyond
        # protocol precision. The kept logits are re-read at full
        # precision through the gather below.
        logits = out.obj.reshape(b, n)
        _, top_i = _topk_wide(logits, k)
        top_l_native = jnp.take_along_axis(logits, top_i, axis=1)
        top_l = top_l_native.astype(jnp.float32)
        sel = jnp.take_along_axis(out.bbox.reshape(b, n, 4),
                                  top_i[..., None], axis=1)
        s = jax.nn.sigmoid(sel.astype(jnp.float32))
        rem = top_i % (hh * ww)
        ai = top_i // (hh * ww)
        gx = (rem % ww).astype(jnp.float32)
        gy = (rem // ww).astype(jnp.float32)
        anc = jnp.asarray(anchors[h], jnp.float32)  # (A, 2) pixels
        aw = jnp.take(anc[:, 0], ai)
        ah = jnp.take(anc[:, 1], ai)
        cx = (s[..., 0] * 2.0 - 0.5 + gx) * scale
        cy = (s[..., 1] * 2.0 - 0.5 + gy) * scale
        w_ = (s[..., 2] * 2.0) ** 2 * aw
        h_ = (s[..., 3] * 2.0) ** 2 * ah
        all_b.append(jnp.stack([cx - w_ / 2, cy - h_ / 2,
                                cx + w_ / 2, cy + h_ / 2], axis=-1))
        all_s.append(jax.nn.sigmoid(top_l))
        all_l.append(top_l_native)
    out3 = (jnp.concatenate(all_b, axis=1),
            jnp.concatenate(all_s, axis=1),
            jnp.concatenate(all_l, axis=1))
    return out3 if return_logits else out3[:2]


def decode_topk_global(outs, anchors: np.ndarray,
                       head_scales: Sequence[int], pre_nms_topk: int):
    """ONE global top-k over the concatenated objectness logits of all
    heads, then decode only the survivors.

    Exactly equivalent to ``decode_topk_heads`` + threshold + per-image
    global top-k ON THE NATIVE-DTYPE LOGITS (the two-stage composition
    computes the global top-k of all candidates; sigmoid is monotonic;
    and ties break by lowest concatenated index in BOTH formulations
    since the concat preserves head-major candidate order — note the
    second stage must sort logits, not scores: f32 sigmoid saturates to
    exactly 1.0 above logit ≈ 16.6, collapsing distinct candidates into
    ties) — but it issues a single ``lax.top_k``
    instead of four: measured on v5e, each top_k call carries ~0.6 ms of
    n-independent fixed cost (n=1200 sorts as slowly as n=4800), so
    collapsing 3 per-head sorts + the per-image re-sort into one
    full-width sort is a net ~1.5 ms win at 640px bs=16 (PERF.md r3).

    → boxes (B, k, 4) xyxy f32, scores (B, k) f32 — sorted by
    DESCENDING score (the order NMS consumes).
    """
    b = outs[0].obj.shape[0]
    heads = []
    off = 0
    for h, out in enumerate(outs):
        _, a, hh, ww, _ = out.obj.shape
        heads.append((off, a, hh, ww))
        off += a * hh * ww
    n = off
    k = min(pre_nms_topk, n)

    logits = jnp.concatenate([o.obj.reshape(b, -1) for o in outs], axis=1)
    bbox = jnp.concatenate([o.bbox.reshape(b, -1, 4) for o in outs],
                           axis=1)
    # sort in the head's native dtype (bf16 on TPU — see
    # decode_topk_heads); kept logits re-read at full precision below
    top_l, top_i = _topk_wide(logits, k)

    # static per-head lookup tables, indexed by the candidate's head id
    offs = np.asarray([hd[0] for hd in heads] + [n], np.int32)
    hid = jnp.sum(top_i[..., None] >= jnp.asarray(offs[1:-1])[None, None],
                  axis=-1) if len(heads) > 1 else jnp.zeros_like(top_i)
    scale_t = jnp.asarray(head_scales, jnp.float32)
    ww_t = jnp.asarray([hd[3] for hd in heads], jnp.int32)
    hw_t = jnp.asarray([hd[2] * hd[3] for hd in heads], jnp.int32)
    off_t = jnp.asarray(offs[:-1])
    # anchors flattened (H*A, 2) so (head, anchor) indexes one table
    anc = np.asarray(anchors, np.float32)          # (H, A, 2)
    n_a = anc.shape[1]
    anc_t = jnp.asarray(anc.reshape(-1, 2))

    rel = top_i - jnp.take(off_t, hid)
    hw = jnp.take(hw_t, hid)
    ww = jnp.take(ww_t, hid)
    ai = rel // hw
    rem = rel % hw
    gx = (rem % ww).astype(jnp.float32)
    gy = (rem // ww).astype(jnp.float32)
    scale = jnp.take(scale_t, hid)
    aw = jnp.take(anc_t[:, 0], hid * n_a + ai)
    ah = jnp.take(anc_t[:, 1], hid * n_a + ai)

    sel = jnp.take_along_axis(bbox, top_i[..., None], axis=1)
    s = jax.nn.sigmoid(sel.astype(jnp.float32))
    cx = (s[..., 0] * 2.0 - 0.5 + gx) * scale
    cy = (s[..., 1] * 2.0 - 0.5 + gy) * scale
    w_ = (s[..., 2] * 2.0) ** 2 * aw
    h_ = (s[..., 3] * 2.0) ** 2 * ah
    boxes = jnp.stack([cx - w_ / 2, cy - h_ / 2,
                       cx + w_ / 2, cy + h_ / 2], axis=-1)
    return boxes, jax.nn.sigmoid(top_l.astype(jnp.float32))


def make_detector(model, hparams, input_size: int,
                  score_threshold: float = 0.001,
                  nms_iou: float = 0.5, pre_nms_topk: int = 512,
                  max_det: int = 300, compute_dtype=jnp.bfloat16,
                  pallas_stem_variables=None, pallas_stem_interpret=False,
                  fold_early: bool = True,
                  mesh=None, dual=False, spatial=False):
    """Build the jitted end-to-end detector.

    Returns ``detect(variables, images) -> Detections``; ``images`` may be
    uint8 at native resolution (preproc fused in).

    ``dual``: build the dual-stream entry ``detect(variables, rgb, ir)``
    instead — native-resolution uint8 RGB (e.g. 1920×1080) and IR
    (640×512) frames are aligned to the detector grid by
    ``preprocess_dual`` INSIDE the jitted program and detected as one
    modality-major batch of 2B frames (the reference feeds modalities as
    separate samples, AntiUAVDataset.py:110-123).

    ``pallas_stem_variables``: when given, a weight-specialized fast
    path is built — the fused Pallas stem kernels when the model's
    layer_config starts with the DyConv(32,3,1)+DyConv(64,3,2) stem
    (ops/pallas_stem_split.py), or the algebraically folded 1×1 stem
    for DySOEM models (fold_input_stem). Either way the WHOLE network's
    weights are bound AT BUILD TIME from this tree and the ``variables``
    argument of ``detect`` is IGNORED — build a new detector per
    checkpoint, or pass ``pallas_stem_variables=None`` to keep
    ``variables`` live (pure-XLA path).

    ``fold_early`` (default on, Pallas-stem path only): additionally run
    the post-stem ResidualBlock+downsample in the parity-folded 2×2→
    channels layout (ops/fold_early) — the @H/2 activations then carry
    ≥128 lanes (zero lane padding), measured +2.4 ms at bs=16 @640 on
    v5e. Reassociation-level numerics (same contractions plus exact-zero
    terms; bitwise only at infinite precision — parity-tested at f64).
    Gated off automatically unless the tail starts with the
    [B,1]+[128,3,2] tokens the fold consumes.

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``'data'`` axis. When
    given, the detector is compiled as a pjit program: images batch-sharded
    over the ZeRO group (``parallel.mesh.BATCH_AXES`` — data×fsdp×ep),
    params replicated, results batch-sharded — the inference
    counterpart of ``parallel.make_sharded_train_step`` (the reference has
    no multi-device inference at all; SURVEY §2.6). With ``spatial`` the
    input frames are additionally row-sharded over the mesh's 'sp' axis
    and GSPMD spatially partitions the convs (halo exchange), dividing
    per-chip activation memory by the sp factor — the scaling story for
    very-high-resolution frames (SURVEY §2.6 / BASELINE config 3). The
    Pallas stem fast path is single-chip only and is gated off under a
    mesh (the folded-1×1-stem path is plain XLA and stays available).
    """
    anchors = np.asarray(hparams.anchors, np.float32)
    # note: hparams.bbox_loss_fn no longer matters here — both modes
    # decode to the same absolute-pixel boxes (see decode_topk_heads)

    jit_kw = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        if spatial and "sp" not in mesh.axis_names:
            raise ValueError("spatial=True needs an 'sp' mesh axis "
                             f"(mesh has {mesh.axis_names})")
        from .parallel.mesh import BATCH_AXES
        # batch over the full ZeRO group (data×fsdp×ep): on a training
        # mesh with fsdp/ep axes, inference parallelizes over them too
        img_spec = P(BATCH_AXES, "sp") if spatial else P(BATCH_AXES)
        n_img = 2 if dual else 1
        jit_kw = dict(
            in_shardings=(NamedSharding(mesh, P()),)
            + (NamedSharding(mesh, img_spec),) * n_img,
            out_shardings=NamedSharding(mesh, P(BATCH_AXES)))
    elif spatial:
        raise ValueError("spatial=True requires mesh")

    stem = None
    # Gate: the kernels emit whole 16-row strips (pallas_l2 needs
    # H % 16 == 0). The quad-parity layout pads all lane widths to
    # 128-multiples INTERNALLY, so — unlike the r2 row-pair-folded
    # layout — there is no %128 width constraint: 608/416/336/512 all
    # verified bit-exact vs interpret on hardware (r3). Mosaic kernels
    # have no SPMD partitioning rule, so the fast path is single-chip
    # only (under a mesh the plain-XLA forward is used instead).
    _stem_ok = input_size % 16 == 0 and mesh is None
    if (pallas_stem_variables is not None and hasattr(model, "layer_config")
            and _stem_ok):
        from .ops.pallas_stem_split import detector_stem_fast_path
        stem = detector_stem_fast_path(
            model, pallas_stem_variables, model.layer_config,
            getattr(model, "attn_temperature", 30.0),
            interpret=pallas_stem_interpret, input_size=input_size,
            fold_early=fold_early)

    # DySOEM folded-stem fast path (exact; eval-only): the 1×1 stem is
    # algebraically composed past soem_0's space_to_depth so the
    # 4×-lane-padded full-res stem activation never materializes — the
    # fix that lets cfg3 run its real bs=32 @1280 in one program. See
    # fold_input_stem's docstring.
    # (type-gated: RTMUAVDet also carries a `stem_folded` flag since its
    # own folded front landed (ops/fold_rtm), but its decode
    # parameterization is not the YOLO one this detector builds — RTM
    # stays hand-wired in bench.py, matching its not-dispatchable status)
    from .models.dysoem_simfpn import DySOEM_SimFPN as _DySOEM
    full_fwd = None
    if (pallas_stem_variables is not None and stem is None
            and isinstance(model, _DySOEM) and not model.stem_folded
            and input_size % 2 == 0):
        if input_size % 4 == 0:
            # row-folded level-0 path through neck+head on top of the
            # folded stem (ops/fold_soem_neck): the 2x-lane-padded @H/2
            # 64-ch maps never exist; decode order is bit-identical.
            # Measured 285.7 -> 270.3 ms forward at cfg3 (PERF.md r5).
            import os as _os
            from .ops.fold_soem_neck import fold_soem_neck_forward
            # per-sample mixed-kernel Pallas SOEMs: DEFAULT ON for bf16
            # models (auto-gated inside fold_soem_neck_forward) — cfg3
            # 101.0 -> 140.8 fps measured end-to-end (PERF.md r5).
            # UAVDET_SOEM_DYCONV=0 is the A/B opt-out.
            dyc = _os.environ.get("UAVDET_SOEM_DYCONV", "")
            full_fwd = fold_soem_neck_forward(
                model, pallas_stem_variables,
                dyconv=None if dyc == "" else dyc == "1")
        if full_fwd is None:
            from .models.dysoem_simfpn import fold_input_stem
            front = fold_input_stem(pallas_stem_variables,
                                    dtype=compute_dtype)
            stem = (front, model.clone(stem_folded=True),
                    pallas_stem_variables)

    def _body(variables, x) -> Detections:
        """x: frames at the detector grid — raw uint8 (fused-stem /255
        fold) or preprocessed compute-dtype floats."""
        if full_fwd is not None:
            outs = full_fwd(x)
        elif stem is not None:
            stem_fn, tail_model, tail_vars = stem
            outs = tail_model.apply(tail_vars, stem_fn(x), train=False)
        else:
            if x.dtype == jnp.uint8:
                x = preprocess(x, input_size, compute_dtype)
            outs = model.apply(variables, x, train=False)
        scales = tuple(input_size // o.obj.shape[2] for o in outs)
        if outs[0].obj.shape[0] > 1:
            # ONE global top-k across all heads; candidates arrive sorted
            # by descending score, so the old per-image re-top-k is gone
            # too (provably identical output — see decode_topk_global).
            # Masking the below-threshold SUFFIX to -inf preserves the
            # sorted order NMS consumes.
            boxes, scores = decode_topk_global(outs, anchors, scales,
                                               pre_nms_topk)
            scores = jnp.where(scores >= score_threshold, scores,
                               -jnp.inf)
        else:
            # batch 1: the single full-width sort measured SLOWER than
            # the per-head two-stage form (227 vs 240 fps on cfg1 —
            # narrow sorts lose their batch parallelism); both paths are
            # bitwise identical (tested), so pick by measurement.
            # The second-stage sort key must be the NATIVE-dtype LOGITS
            # (same key as decode_topk_global): f32 sigmoid saturates to
            # exactly 1.0 above logit ≈ 16.6, so sorting by score there
            # collapses distinct candidates into ties and hands NMS a
            # different order than the batched branch (r3 review fix).
            bx, sc, lg = decode_topk_heads(outs, anchors, scales,
                                           pre_nms_topk,
                                           return_logits=True)
            neg = jnp.asarray(-jnp.inf, lg.dtype)
            lg = jnp.where(sc >= score_threshold, lg, neg)
            k = min(pre_nms_topk, lg.shape[1])
            top_l, top_i = jax.lax.top_k(lg, k)
            boxes = jnp.take_along_axis(bx, top_i[..., None], axis=1)
            scores = jnp.where(top_l != neg,
                               jnp.take_along_axis(sc, top_i, axis=1),
                               -jnp.inf)

        def per_image(top_bx, top_sc):
            keep_idx, alive, order = nms(top_bx, top_sc, nms_iou, max_det)
            valid = keep_idx >= 0
            safe = jnp.maximum(keep_idx, 0)
            out_b = jnp.where(valid[:, None], top_bx[safe], 0.0)
            out_s = jnp.where(valid, top_sc[safe], 0.0)
            return out_b, out_s, valid

        out_b, out_s, valid = jax.vmap(per_image)(boxes, scores)
        return Detections(boxes=out_b, scores=out_s, valid=valid)

    if dual:
        @partial(jax.jit, **jit_kw)
        def detect(variables, rgb, ir) -> Detections:
            x = preprocess_dual(rgb, ir, input_size, compute_dtype)
            return _body(variables, x)
    else:
        @partial(jax.jit, **jit_kw)
        def detect(variables, images) -> Detections:
            if not ((stem is not None or full_fwd is not None)
                    and images.dtype == jnp.uint8
                    and images.shape[1:3] == (input_size, input_size)):
                images = preprocess(images, input_size, compute_dtype)
            return _body(variables, images)
    return detect
