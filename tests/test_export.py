"""AOT export round trip: serialize → deserialize → identical detections."""

import numpy as np
import jax
import jax.numpy as jnp

from uavdet_tpu.export import export_detector, load_detector
from uavdet_tpu.models import DyYOLO
from uavdet_tpu.inference import make_detector
from tests.test_models import TINY_DY_CONFIG
from tests.test_inference import HP


def test_export_round_trip(rng):
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False)
    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)

    blob = export_detector(model, HP, variables, input_size=64,
                           batch_size=2, compute_dtype=jnp.float32,
                           pre_nms_topk=64, max_det=8)
    assert isinstance(blob, bytes) and len(blob) > 1000

    det = load_detector(blob)
    boxes, scores, valid = det(imgs)
    assert boxes.shape == (2, 8, 4)
    assert scores.shape == (2, 8) and valid.shape == (2, 8)

    # must match the live detector (same math; the exported program is
    # re-lowered so fusion/association may differ at float-noise level)
    live = make_detector(model, HP, 64, compute_dtype=jnp.float32,
                         pre_nms_topk=64, max_det=8,
                         pallas_stem_variables=variables)
    d = live(variables, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(d.boxes),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(d.valid))


def test_export_dual_round_trip(rng):
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False)
    blob = export_detector(model, HP, variables, input_size=64,
                           batch_size=1, dual=True,
                           compute_dtype=jnp.float32,
                           pre_nms_topk=64, max_det=8)
    det = load_detector(blob)
    rgb = rng.integers(0, 256, (1, 1080, 1920, 3), dtype=np.uint8)
    ir = rng.integers(0, 256, (1, 512, 640, 3), dtype=np.uint8)
    boxes, scores, valid = det(rgb, ir)
    assert boxes.shape == (2, 8, 4)  # 2B frames, modality-major
    assert np.isfinite(np.asarray(scores)).all()


def test_export_without_pallas_stem(rng):
    """pallas_stem_variables must be overridable through detector_kw —
    a CPU-platform artifact cannot lower Mosaic custom calls, so the
    XLA-stem export path has to exist (ADVICE r2)."""
    model = DyYOLO(layer_config=TINY_DY_CONFIG)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False)
    blob = export_detector(model, HP, variables, input_size=64,
                           batch_size=2, compute_dtype=jnp.float32,
                           pre_nms_topk=64, max_det=8,
                           pallas_stem_variables=None)
    det = load_detector(blob)
    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    boxes, scores, valid = det(imgs)
    live = make_detector(model, HP, 64, compute_dtype=jnp.float32,
                         pre_nms_topk=64, max_det=8)
    d = live(variables, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(d.boxes),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(d.valid))
