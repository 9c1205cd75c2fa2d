from .boxes import (
    box_convert,
    box_iou_pairwise,
    box_iou_elementwise,
    complete_box_iou,
    complete_box_iou_loss,
    anchor_iou,
)
from .targets import encode_yolo_targets, head_sizes
from .decode import decode_predictions
from .losses import yolo_loss, bce_with_logits
from .nms import nms, batched_nms
