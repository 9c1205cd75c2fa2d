"""The ``layer_config`` interpreter shared by BaselineModel and DyYOLO.

Token semantics (reference model/BaselineModel.py:63-101 and
model/DyYOLO.py:63-112):

  [out_c, k, s]          → CNNBlock(out_c, k, s, padding=1 if k==3 else 0)
  ["B", n]               → ResidualBlock × n repeats
  ["S"]                  → ResidualBlock(no skip) + 1x1 CNNBlock(half) +
                           ScalePrediction; records a detection tap;
                           in_channels halves afterwards
  ["U"]                  → nearest 2x upsample + concat with the route stack
                           (pushed after every num_repeats==8 ResidualBlock);
                           in_channels triples
  ["DyConv", out_c, k, s]→ DyConvModule (DyYOLO only)

The forward pass threads an explicit route stack exactly like the reference
interpreter loop (BaselineModel.py:105-124).
"""

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    CNNBlock,
    DyConvModule,
    ResidualBlock,
    ScalePrediction,
    YOLOHead,
    upsample2x,
)


def head_channels(layer_config: Sequence, in_channels: int = 3) -> List[int]:
    """Static pass over the config to compute the per-scale head input
    channels (the ``x_out_channels`` the reference collects at "S" tokens)."""
    chans = []
    c = in_channels
    for tok in layer_config:
        if tok[0] == "B":
            continue
        if tok[0] == "S":
            chans.append(c)
            c = c // 2
        elif tok[0] == "U":
            c = c * 3
        elif tok[0] == "DyConv":
            c = tok[1]
        else:
            c = tok[0]
    return chans


class YOLOInterpreter(nn.Module):
    """Backbone+FPN built interpretively from ``layer_config``; ends in a
    shared YOLOHead. ``dynamic=True`` enables the "DyConv" token (DyYOLO)."""

    layer_config: Tuple[Any, ...]
    n_anchors: int = 3
    attn_temperature: float = 30.0
    stop_after: int | None = None  # run only the first N tokens and
    # return the feature map (no YOLOHead; used by ops/fold_early's
    # trainable fold to run the stem prefix with the full model's
    # parameter names — compact auto-numbering depends only on
    # creation order, which a config prefix preserves)
    dtype: Any = None  # jnp dtype; None → float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax.numpy as jnp
        dtype = self.dtype or jnp.float32
        x = x.astype(dtype)
        outs = []
        routes = []

        for i, tok in enumerate(self.layer_config):
            if tok[0] == "B":
                n = tok[1]
                x = ResidualBlock(x.shape[-1], num_repeats=n,
                                  dtype=dtype)(x, train)
                if n == 8:
                    routes.append(x)
            elif tok[0] == "S":
                x = ResidualBlock(x.shape[-1], use_residual=False,
                                  num_repeats=1, dtype=dtype)(x, train)
                x = CNNBlock(x.shape[-1] // 2, kernel_size=(1, 1),
                             dtype=dtype)(x, train)
                outs.append(
                    ScalePrediction(x.shape[-1], dtype=dtype)(x, train))
            elif tok[0] == "U":
                x = upsample2x(x)
                x = jnp.concatenate([x, routes.pop()], axis=-1)
            elif tok[0] == "DyConv":
                out_c, k, s = tok[1:]
                x = DyConvModule(out_c, kernel_size=k, stride=s,
                                 padding=1 if k == 3 else 0,
                                 dtype=dtype)(
                    x, self.attn_temperature, train)
            else:
                out_c, k, s = tok
                x = CNNBlock(out_c, kernel_size=(k, k), stride=(s, s),
                             padding=1 if k == 3 else 0,
                             dtype=dtype)(x, train)
            if self.stop_after is not None and i + 1 == self.stop_after:
                return x

        return YOLOHead(self.n_anchors, len(outs), dtype=dtype,
                        name="yolo_head")(outs)
