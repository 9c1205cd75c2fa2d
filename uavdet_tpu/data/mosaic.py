"""4-image mosaic augmentation (reference dataset/_helper.py:226-287).

Semantics preserved: each image is resized into a (S/2, S/2) quadrant in
row-major order; its (single) box is rescaled into the quadrant; boxes that
degenerate (x1>=x2 or y1>=y2) are skipped AND their quadrant is left blank
(the reference's loop only advances the quadrant index on success).
"""

from typing import List, Sequence, Tuple

import numpy as np


def mosaic_layout(sizes: Sequence[Tuple[int, int]],
                  bboxes: Sequence[np.ndarray],
                  target_size: Tuple[int, int]) -> List[tuple]:
    """Geometry-only mosaic plan: ``[(source_index, quadrant, box), ...]``
    for the sources that get placed — the exact quadrant-advance +
    degenerate-skip semantics of ``create_mosaic_4_img``, computable from
    header-only (h, w) sizes + manifest boxes without decoding a pixel
    (the multi-host sharded-decode membership replay relies on this;
    data/pipeline.py::_batches_sharded)."""
    th, tw = target_size[0], target_size[1]
    qw, qh = tw // 2, th // 2

    out: List[tuple] = []
    quadrant = 0
    for i, ((oh, ow), box) in enumerate(zip(sizes, bboxes)):
        box = np.asarray(box, np.float32).reshape(-1)
        x_off = (quadrant % 2) * qw
        y_off = (quadrant // 2) * qh
        sx, sy = qw / ow, qh / oh

        x1 = x_off + box[0] * sx
        y1 = y_off + box[1] * sy
        x2 = x_off + box[2] * sx
        y2 = y_off + box[3] * sy
        if x1 >= x2 or y1 >= y2:
            continue
        out.append((i, quadrant, [x1, y1, x2, y2]))
        if len(out) >= 4:
            break
        quadrant += 1
    return out


def create_mosaic_4_img(images: List[np.ndarray], bboxes: List[np.ndarray],
                        target_size: Tuple[int, int] = (640, 640)):
    if len(images) < 4 or len(images) != len(bboxes):
        raise ValueError(
            f"mosaic requires >=4 images with one box array each; got "
            f"{len(images)} images / {len(bboxes)} box arrays")

    import cv2

    th, tw = target_size[0], target_size[1]
    mosaic = np.zeros((th, tw, 3), dtype=np.uint8)
    qw, qh = tw // 2, th // 2

    layout = mosaic_layout([img.shape[:2] for img in images], bboxes,
                           target_size)
    for i, quadrant, _ in layout:
        x_off = (quadrant % 2) * qw
        y_off = (quadrant // 2) * qh
        resized = cv2.resize(images[i], (qw, qh),
                             interpolation=cv2.INTER_LANCZOS4)
        if resized.ndim == 2:
            resized = np.repeat(resized[..., None], 3, axis=-1)
        mosaic[y_off:y_off + qh, x_off:x_off + qw] = resized

    return mosaic, np.asarray([b for _, _, b in layout], np.float32)
