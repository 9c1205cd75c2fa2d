"""4-image mosaic augmentation (reference dataset/_helper.py:226-287).

Semantics preserved: each image is resized into a (S/2, S/2) quadrant in
row-major order; its (single) box is rescaled into the quadrant; boxes that
degenerate (x1>=x2 or y1>=y2) are skipped AND their quadrant is left blank
(the reference's loop only advances the quadrant index on success).
"""

from typing import List, Tuple

import numpy as np


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

    out_boxes = []
    quadrant = 0
    for img, box in zip(images, bboxes):
        box = np.asarray(box, np.float32).reshape(-1)
        oh, ow = img.shape[:2]
        x_off = (quadrant % 2) * qw
        y_off = (quadrant // 2) * qh
        sx, sy = qw / ow, qh / oh

        x1 = x_off + box[0] * sx
        y1 = y_off + box[1] * sy
        x2 = x_off + box[2] * sx
        y2 = y_off + box[3] * sy
        if x1 >= x2 or y1 >= y2:
            continue
        out_boxes.append([x1, y1, x2, y2])

        resized = cv2.resize(img, (qw, qh), interpolation=cv2.INTER_LANCZOS4)
        if resized.ndim == 2:
            resized = np.repeat(resized[..., None], 3, axis=-1)
        mosaic[y_off:y_off + qh, x_off:x_off + qw] = resized

        if len(out_boxes) >= 4:
            break
        quadrant += 1

    return mosaic, np.asarray(out_boxes, np.float32)
