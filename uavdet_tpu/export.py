"""AOT export of the jitted detector — serving without Python model code.

The reference has no deployment story at all (its inference path exists
only inside Lightning's validation loop, model/_base.py:195-204). Here the
whole preproc→forward→decode→NMS program from ``make_detector`` can be
AOT-lowered and serialized with ``jax.export`` (StableHLO + calling
convention), so a serving process needs only ``deserialize(blob).call``
— no flax modules, no config tree, no weight files (parameters are baked
into the artifact as constants via closure).

Artifacts are platform-specific (lowered for the platform set at export
time — 'tpu' for deployment, 'cpu' for tests/CI).

Usage::

    blob = export_detector(model, hparams, variables, input_size=640,
                           batch_size=16)
    open("detector.bin", "wb").write(blob)
    # serving side:
    det = load_detector(open("detector.bin", "rb").read())
    boxes, scores, valid = det(frames_uint8)   # (B,S,S,3) uint8

CLI: ``python scripts/export_detector.py --out detector.bin``.
"""

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport


def export_detector(model, hparams, variables, input_size: int,
                    batch_size: int, dual: bool = False,
                    platforms: Sequence[str] = None,
                    **detector_kw) -> bytes:
    """Serialize the end-to-end detector for ``(B, S, S, 3)`` uint8 frames
    (or, with ``dual=True``, native-res RGB (B,1080,1920,3) + IR
    (B,512,640,3) uint8 streams → 2B detections).

    The ``variables`` tree is closed over — the exported program carries
    the weights as constants. ``detector_kw`` forwards to
    ``make_detector`` (score_threshold, pre_nms_topk, max_det, ...);
    pass ``pallas_stem_variables=None`` there to disable the Pallas stem
    (e.g. for 'cpu'-platform artifacts that cannot lower Mosaic calls).
    """
    from .inference import make_detector

    stem_vars = detector_kw.pop("pallas_stem_variables", variables)
    detect = make_detector(model, hparams, input_size, dual=dual,
                           pallas_stem_variables=stem_vars, **detector_kw)

    if dual:
        def fn(rgb, ir):
            d = detect(variables, rgb, ir)
            return d.boxes, d.scores, d.valid

        specs = (jax.ShapeDtypeStruct((batch_size, 1080, 1920, 3),
                                      jnp.uint8),
                 jax.ShapeDtypeStruct((batch_size, 512, 640, 3), jnp.uint8))
    else:
        def fn(images):
            d = detect(variables, images)
            return d.boxes, d.scores, d.valid

        specs = (jax.ShapeDtypeStruct(
            (batch_size, input_size, input_size, 3), jnp.uint8),)

    exp = jexport.export(jax.jit(fn), platforms=platforms)(*specs)
    return bytes(exp.serialize())


def load_detector(blob: bytes) -> Callable:
    """Deserialize an ``export_detector`` artifact.

    → ``det(images) -> (boxes (B,max_det,4) f32, scores (B,max_det) f32,
    valid (B,max_det) bool)`` (for dual artifacts: ``det(rgb, ir)``).
    The returned callable is jit-compiled on first use for the current
    backend (must match the export platform)."""
    exp = jexport.deserialize(bytearray(blob))
    call = jax.jit(exp.call)

    def det(*frames):
        return call(*(jnp.asarray(f) for f in frames))

    return det
