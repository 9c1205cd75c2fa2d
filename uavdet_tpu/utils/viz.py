"""Visualization helpers (reference utils/postprocess.py:8-45 and
dataset/_helper.py:185-223)."""

from typing import Optional

import numpy as np


def draw_bbox(image: np.ndarray, bbox, color=(0, 255, 0), thickness: int = 2,
              label: Optional[str] = None, format: str = "xyxy"):
    """Draw one labelled box on an image (cv2), xyxy or xywh format."""
    import cv2

    if format == "xywh":
        x, y, w, h = map(int, bbox)
        x1, y1, x2, y2 = x, y, x + w, y + h
    else:
        x1, y1, x2, y2 = map(int, bbox)

    cv2.rectangle(image, (x1, y1), (x2, y2), color, thickness)
    if label is not None:
        font = cv2.FONT_HERSHEY_SIMPLEX
        (tw, th), base = cv2.getTextSize(label, font, 0.5, 1)
        cv2.rectangle(image, (x1, y1 - th - base - 5), (x1 + tw, y1),
                      color, -1)
        cv2.putText(image, label, (x1, y1 - base - 3), font, 0.5,
                    (255, 255, 255), 1)
    return image


def plot_sample_data(pipeline, out_path: Optional[str] = None, n: int = 4):
    """Plot n samples with boxes from a DataPipeline (matplotlib)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(12, 12))
    axes = axes.flatten()
    shown = 0
    for batch in iter(pipeline):
        img = np.asarray(batch.image[0])
        boxes = np.asarray(batch.boxes[0]) * img.shape[0]
        mask = np.asarray(batch.box_mask[0])
        axes[shown].imshow(img)
        for box, valid in zip(boxes, mask):
            if not valid:
                continue
            x1, y1, x2, y2 = box
            axes[shown].add_patch(plt.Rectangle(
                (x1, y1), x2 - x1, y2 - y1, fill=False, edgecolor="cyan",
                linewidth=2))
        axes[shown].set_title(f"Sample {shown + 1}")
        axes[shown].axis("off")
        shown += 1
        if shown >= n:
            break
    plt.tight_layout()
    if out_path:
        plt.savefig(out_path)
        plt.close(fig)
    else:  # pragma: no cover
        plt.show()
    return out_path


def summarize_model(model, input_shape=(1, 64, 64, 3), **init_kwargs):
    """Model inspection table (the torchinfo/torchview role in the
    reference's tooling, requirements.txt:174,176) via flax tabulate."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    return nn.tabulate(
        model, jax.random.key(0),
        compute_flops=False, compute_vjp_flops=False)(
        jnp.zeros(input_shape, jnp.float32), **init_kwargs)
