"""Inference pipeline tests: decode_all_heads, dual-stream preproc, the
full detector, and target validation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uavdet_tpu.inference import (
    decode_all_heads, make_detector, preprocess, preprocess_dual)
from uavdet_tpu.models import DyYOLO
from uavdet_tpu.ops.targets import encode_yolo_targets, validate_targets
from uavdet_tpu.utils.datatypes import DetectionResults
from tests.test_models import TINY_DY_CONFIG

HP_ANCHORS = np.asarray(
    [[[40, 30], [60, 46], [54, 36]],
     [[18, 14], [24, 18], [30, 12]],
     [[6, 5], [10, 6], [13, 8]]], np.float32)


class HP:
    anchors = HP_ANCHORS.tolist()
    head_scales = [16, 8, 4]
    bbox_loss_fn = "mse"
    attn_temperature = 30.0
    layer_config = list(TINY_DY_CONFIG)


def test_preprocess_uint8_resize_normalize():
    img = np.zeros((2, 32, 48, 3), np.uint8)
    img[:, :, :24] = 255
    out = preprocess(jnp.asarray(img), 64, jnp.float32)
    assert out.shape == (2, 64, 64, 3)
    assert float(out.max()) <= 1.0 and float(out.min()) >= 0.0
    # left half bright, right half dark after resize
    assert float(out[0, 32, 8, 0]) > 0.9
    assert float(out[0, 32, 56, 0]) < 0.1


def test_topk_wide_chunked_matches_single_sort(rng):
    """_topk_wide's chunked two-stage path (engaged for n ≥ 4·chunk;
    the 84.7→44.7 ms cfg3 postprocess win, PERF.md r3) must reproduce
    the single lax.top_k exactly — values provably (union-of-per-chunk
    argument), and here also indices, on data dense with bf16 ties."""
    from uavdet_tpu.inference import _TOPK_CHUNK, _topk_wide

    n = 4 * _TOPK_CHUNK + 1234   # engages chunking, exercises -inf pad
    k = 64
    x = jnp.asarray(
        np.round(rng.normal(size=(3, n)) * 4) / 4, jnp.bfloat16)
    rv, ri = jax.lax.top_k(x, k)
    gv, gi = _topk_wide(x, k)
    np.testing.assert_array_equal(np.asarray(gv, np.float32),
                                  np.asarray(rv, np.float32))
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))


def test_topk_wide_guards_tie_order_domain(rng):
    """Outside the empirically-verified tie-order envelope (stage-2 width
    m·k > 51200) _topk_wide must fall back to THE single lax.top_k —
    bitwise, trivially, because it IS that call. Also pins that the cfg3
    integration shape stays INSIDE the envelope (still chunked)."""
    from uavdet_tpu.inference import _TOPK_CHUNK, _topk_wide

    # m·k = ceil(n/chunk)·k = 7·8192 = 57344 > 51200 → must fall back.
    n, k = 7 * _TOPK_CHUNK, 8192
    x = jnp.asarray(rng.normal(size=(2, n)), jnp.float32)
    rv, ri = jax.lax.top_k(x, k)
    gv, gi = _topk_wide(x, k)
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))

    # cfg3's real width (DySOEM @1280: 3·(640²+320²+160²)) with the
    # production k=512 must remain in the chunked domain: m·k ≤ 51200.
    n_cfg3 = 3 * (640 ** 2 + 320 ** 2 + 160 ** 2)
    m = -(-n_cfg3 // _TOPK_CHUNK)
    assert n_cfg3 >= 4 * _TOPK_CHUNK and m * 512 <= 51200


def test_fetch_sync_scalar_leaf():
    """fetch_sync documents support for arbitrary pytrees — including
    ones whose first leaf is a Python scalar (e.g. (loss_float, arrays)
    from a probe's run())."""
    from uavdet_tpu.utils.timing import fetch_sync

    out = fetch_sync((3.5, jnp.ones(4)))
    assert float(out[0]) == 3.5
    out = fetch_sync({"n": 7, "x": jnp.zeros((2, 2))})
    assert int(out[0]) == 7
    out = fetch_sync(jnp.arange(6).reshape(2, 3))
    assert int(out[0]) == 0


def test_preprocess_matmul_resize_matches_jax_image(rng):
    """preprocess's separable-matmul resize (the MXU form that replaced
    XLA's gather lowering of jax.image.resize — 4.3 → 1.9 ms for
    8×1080p→640² on v5e, PERF.md r3) must reproduce
    jax.image.resize(method='bilinear') numerics: the antialiased
    triangle kernel on downscale, plain 2-tap on upscale, and the
    drop+renormalize edge handling."""
    for shape in ((2, 108, 192, 3), (2, 51, 64, 3), (1, 130, 70, 1)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = np.asarray(preprocess(jnp.asarray(img), 64, jnp.float32))
        x = jnp.asarray(img, jnp.float32) / 255.0
        ref = np.asarray(jax.image.resize(
            x, (shape[0], 64, 64, shape[3]), "bilinear"))
        np.testing.assert_allclose(got, ref, rtol=0, atol=3e-5)


def test_preprocess_dual_alignment(rng):
    rgb = rng.integers(0, 255, size=(3, 108, 192, 3), dtype=np.uint8)
    ir = rng.integers(0, 255, size=(3, 51, 64, 3), dtype=np.uint8)
    out = preprocess_dual(jnp.asarray(rgb), jnp.asarray(ir), 64,
                          jnp.float32)
    assert out.shape == (6, 64, 64, 3)
    # modality-major: first 3 = rgb, last 3 = ir
    r_only = preprocess(jnp.asarray(rgb), 64, jnp.float32)
    np.testing.assert_allclose(np.asarray(out[:3]), np.asarray(r_only),
                               rtol=1e-5)


def test_decode_all_heads_mse_center():
    """Zero logits decode to box centered at (cell+0.5-ish) with w=h=anchor:
    σ(0)*2-0.5 = 0.5 offsets, (σ(0)*2)² = 1 → w = anchor."""
    sizes = [4, 8, 16]
    outs = []
    for s in sizes:
        outs.append(DetectionResults(
            bbox=jnp.zeros((1, 3, s, s, 4)), obj=jnp.zeros((1, 3, s, s, 1))))
    boxes, scores = decode_all_heads(outs, HP_ANCHORS, [16, 8, 4], "mse")
    assert boxes.shape == (1, 3 * (16 + 64 + 256), 4)
    # first head, anchor 0, cell (0,0): center = (0.5, 0.5)·16 px = 8
    b0 = np.asarray(boxes[0, 0])
    cx, cy = (b0[0] + b0[2]) / 2, (b0[1] + b0[3]) / 2
    assert cx == pytest.approx(8.0, abs=1e-4)
    assert cy == pytest.approx(8.0, abs=1e-4)
    # w = anchor_w (40 px), h = anchor_h (30 px)
    assert b0[2] - b0[0] == pytest.approx(40.0, rel=1e-5)
    assert b0[3] - b0[1] == pytest.approx(30.0, rel=1e-5)
    # scores = σ(0) = 0.5
    assert float(scores[0, 0]) == pytest.approx(0.5)


def test_detector_end_to_end_trained_signal(rng):
    """A detector over a model trained briefly on painted boxes should put
    its best box near the target."""
    from uavdet_tpu.training import build_optimizer, init_state, \
        make_train_step
    from tests.test_train_step import HP as THP, _synthetic_batch, INPUT

    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    tx = build_optimizer(THP)
    state = init_state(model, tx, jax.random.key(0), INPUT, batch_size=4)
    step = make_train_step(model, tx, THP, INPUT)
    batch = _synthetic_batch(rng, batch=4)
    first = None
    for _ in range(60):
        state, m = step(state, batch)
        first = first or float(m["loss"])

    detect = make_detector(model, THP, INPUT, compute_dtype=jnp.float32,
                           pre_nms_topk=128, max_det=10)
    det = detect({"params": state.params,
                  "batch_stats": state.batch_stats}, batch.image)
    assert det.boxes.shape == (4, 10, 4)
    assert float(m["loss"]) < first * 0.6  # training actually progressed
    gt = np.asarray(batch.boxes[0, 0]) * INPUT
    gcx, gcy = (gt[0] + gt[2]) / 2, (gt[1] + gt[3]) / 2
    # SOME of the top-10 boxes should localize near the painted target
    # (60 steps on 4 images is signal, not convergence)
    centers = np.asarray(det.boxes[0])
    ccx = (centers[:, 0] + centers[:, 2]) / 2
    ccy = (centers[:, 1] + centers[:, 3]) / 2
    dist = np.sqrt((ccx - gcx) ** 2 + (ccy - gcy) ** 2)
    valid = np.asarray(det.valid[0])
    assert dist[valid].min() < INPUT * 0.25, (dist[valid], gt)


@pytest.mark.parametrize("mode", ["mse", "ciou"])
def test_decode_topk_matches_full_decode(rng, mode):
    """decode_topk_heads == decode_all_heads followed by per-head top-k on
    scores, for both bbox_loss_fn modes."""
    from uavdet_tpu.inference import decode_topk_heads

    sizes = [4, 8, 16]
    outs = []
    for s in sizes:
        outs.append(DetectionResults(
            bbox=jnp.asarray(rng.normal(size=(2, 3, s, s, 4)).astype(
                np.float32)),
            obj=jnp.asarray(rng.normal(size=(2, 3, s, s, 1)).astype(
                np.float32))))
    scales = [16, 8, 4]
    k = 24
    fb, fs = decode_all_heads(outs, HP_ANCHORS, scales, mode)
    want_b, want_s = [], []
    off = 0
    for s in sizes:
        n = 3 * s * s
        sc = fs[:, off:off + n]
        bx = fb[:, off:off + n]
        kk = min(k, n)
        ts, ti = jax.lax.top_k(sc, kk)
        want_s.append(ts)
        want_b.append(jnp.take_along_axis(bx, ti[..., None], axis=1))
        off += n
    want_b = np.concatenate([np.asarray(w) for w in want_b], 1)
    want_s = np.concatenate([np.asarray(w) for w in want_s], 1)

    got_b, got_s = decode_topk_heads(outs, HP_ANCHORS, scales, k)
    if mode == "mse":
        # mse-mode full decode adds grid/anchor in a different op order;
        # values agree to float tolerance
        np.testing.assert_allclose(np.asarray(got_s), want_s, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got_b), want_b,
                                   rtol=1e-5, atol=1e-4)
    else:
        np.testing.assert_allclose(np.asarray(got_s), want_s, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got_b), want_b,
                                   rtol=1e-5, atol=1e-4)


def test_dual_detector_matches_single_stream(rng):
    """make_detector(dual=True) on native-res RGB+IR == the single-stream
    detector on the equivalent preprocessed modality-major batch."""
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    x0 = jnp.zeros((4, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    rgb = jnp.asarray(rng.integers(0, 256, (2, 108, 192, 3), dtype=np.uint8))
    ir = jnp.asarray(rng.integers(0, 256, (2, 51, 64, 3), dtype=np.uint8))

    det_dual = make_detector(model, HP, 64, compute_dtype=jnp.float32,
                             pre_nms_topk=64, max_det=10, dual=True)
    out_d = det_dual(variables, rgb, ir)
    assert out_d.boxes.shape == (4, 10, 4)

    det_single = make_detector(model, HP, 64, compute_dtype=jnp.float32,
                               pre_nms_topk=64, max_det=10)
    x = preprocess_dual(rgb, ir, 64, jnp.float32)
    out_s = det_single(variables, x)
    np.testing.assert_allclose(np.asarray(out_d.boxes),
                               np.asarray(out_s.boxes), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_d.valid),
                                  np.asarray(out_s.valid))


def test_validate_targets():
    grids = encode_yolo_targets(
        jnp.asarray([[[0.2, 0.2, 0.6, 0.6]]], jnp.float32),
        jnp.ones((1, 1), bool), HP_ANCHORS, [16, 8, 4], 64)
    validate_targets(grids, [4, 8, 16])
    with pytest.raises(AssertionError):
        validate_targets(grids, [4, 8])


def _two_stage_global_topk(outs, scales, k, anchors=None):
    """The detector's bs=1 formulation: per-head decode_topk_heads, then
    a second top-k over the union keyed on NATIVE-DTYPE LOGITS (not
    scores — f32 sigmoid saturates to exactly 1.0 above logit ≈ 16.6,
    so a score-keyed second stage reorders high-confidence ties)."""
    from uavdet_tpu.inference import decode_topk_heads
    anchors = HP_ANCHORS if anchors is None else anchors
    hb, hs, hl = decode_topk_heads(outs, anchors, scales, k,
                                   return_logits=True)
    tl, ti = jax.lax.top_k(hl, k)
    ts = jnp.take_along_axis(hs, ti, axis=1)
    tb = jnp.take_along_axis(hb, ti[..., None], axis=1)
    return tb, ts


def test_decode_topk_global_matches_two_stage(rng):
    """decode_topk_global (ONE top_k) must equal the two-stage
    formulation the detector uses at batch 1 EXACTLY (same candidate
    set, same descending order, same tie-breaking by concatenated
    index)."""
    from uavdet_tpu.inference import decode_topk_global

    sizes = [4, 8, 16]
    outs = []
    for s in sizes:
        outs.append(DetectionResults(
            bbox=jnp.asarray(rng.normal(size=(2, 3, s, s, 4)).astype(
                np.float32)),
            obj=jnp.asarray(rng.normal(size=(2, 3, s, s, 1)).astype(
                np.float32))))
    scales = [16, 8, 4]
    k = 48

    gb, gs = decode_topk_global(outs, HP_ANCHORS, scales, k)
    tb, ts = _two_stage_global_topk(outs, scales, k)

    np.testing.assert_array_equal(np.asarray(gs), np.asarray(ts))
    np.testing.assert_array_equal(np.asarray(gb), np.asarray(tb))
    # sorted descending (the order NMS consumes)
    s = np.asarray(gs)
    assert (np.diff(s, axis=1) <= 0).all()


def test_decode_topk_two_stage_matches_global_saturated(rng):
    """Regression (r3 review): with objectness logits in the f32-sigmoid
    saturation regime (σ(x) == 1.0 exactly for x ≳ 16.6), many distinct
    candidates carry IDENTICAL scores, so a second-stage top-k keyed on
    scores scrambles their order relative to the global logit sort — the
    bs=1 and batched detector branches then hand NMS different candidate
    orders. The fixed two-stage path sorts by native-dtype logits and
    must stay bitwise-equal to decode_topk_global here."""
    from uavdet_tpu.inference import decode_topk_global

    sizes = [4, 8]
    scales = [16, 8]
    outs = []
    for s in sizes:
        obj = rng.normal(size=(2, 3, s, s, 1)).astype(np.float32)
        # scatter saturated logits (17..24) across both heads
        flat = obj.reshape(2, -1)
        idx = rng.choice(flat.shape[1], size=24, replace=False)
        flat[:, idx] = rng.integers(17, 25, size=(2, 24)).astype(
            np.float32)
        outs.append(DetectionResults(
            bbox=jnp.asarray(rng.normal(size=(2, 3, s, s, 4)).astype(
                np.float32)),
            obj=jnp.asarray(obj)))
    k = 32

    gb, gs = decode_topk_global(outs, HP_ANCHORS[:2], scales, k)
    tb, ts = _two_stage_global_topk(outs, scales, k,
                                    anchors=HP_ANCHORS[:2])
    # plenty of exactly-tied saturated scores in the selection
    assert (np.asarray(gs) == 1.0).sum() >= 20
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(ts))
    np.testing.assert_array_equal(np.asarray(gb), np.asarray(tb))


def test_detector_bs1_branch_matches_batched(rng):
    """make_detector picks the two-stage top-k at batch 1 (measured faster
    there — PERF.md cfg1) and the single global sort at batch>1; the two
    branches must produce identical surviving detections for the same
    image."""
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    imgs = rng.uniform(size=(3, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.key(1), jnp.asarray(imgs),
                           train=False)
    from tests.test_train_step import HP as THP
    detect = make_detector(model, THP, 64, compute_dtype=jnp.float32,
                           score_threshold=0.01, pre_nms_topk=64,
                           max_det=16)
    d1 = detect(variables, jnp.asarray(imgs[:1]))
    d3 = detect(variables, jnp.asarray(imgs))
    v1, v3 = np.asarray(d1.valid[0]), np.asarray(d3.valid[0])
    np.testing.assert_array_equal(v1, v3)
    n = int(v1.sum())
    assert n >= 1  # untrained logits still clear the 0.01 threshold
    np.testing.assert_allclose(np.asarray(d1.scores[0][:n]),
                               np.asarray(d3.scores[0][:n]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d1.boxes[0][:n]),
                               np.asarray(d3.boxes[0][:n]),
                               rtol=1e-5, atol=1e-4)
