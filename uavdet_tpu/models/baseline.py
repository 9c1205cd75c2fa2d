"""BaselineModel — YOLOv3 (Darknet-53 backbone + upsample/concat FPN).

Parity target: reference model/BaselineModel.py (config
conf/model/baseline.yaml, bbox_loss_fn='ciou'). Pure interpreter model —
see interpreter.py for token semantics.
"""

from typing import Any, Tuple

from flax import linen as nn

from .interpreter import YOLOInterpreter


class BaselineModel(nn.Module):
    layer_config: Tuple[Any, ...]
    n_anchors: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return YOLOInterpreter(
            self.layer_config, n_anchors=self.n_anchors,
            dtype=self.dtype, name="net")(x, train)
