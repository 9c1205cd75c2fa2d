"""DyYOLO — YOLOv3 + dynamic (conditional) convolutions.

Parity target: reference model/DyYOLO.py — the params.yaml-selected model
(reference params.yaml:36). Identical to BaselineModel except the "DyConv"
token maps to DyConvModule with the configured attention temperature
(hparams.attn_temperature, reference params.yaml:72).
"""

from typing import Any, Tuple

from flax import linen as nn

from .interpreter import YOLOInterpreter


class DyYOLO(nn.Module):
    layer_config: Tuple[Any, ...]
    attn_temperature: float = 30.0
    n_anchors: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return YOLOInterpreter(
            self.layer_config, n_anchors=self.n_anchors,
            attn_temperature=self.attn_temperature,
            dtype=self.dtype, name="net")(x, train)
