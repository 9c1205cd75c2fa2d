"""Model dispatch by config name (reference train.py:22-29).

Accepted names: 'baseline', 'DyYOLO', 'DySOEM_SimFPN' — 'RTMUAVDet' is
deliberately not dispatchable, matching the reference.
"""

from .baseline import BaselineModel
from .dy_yolo import DyYOLO
from .dysoem_simfpn import DySOEM_SimFPN


def _tupled(layer_config):
    return tuple(tuple(tok) for tok in layer_config)


def build_model(name: str, hparams, dtype=None):
    """Build a flax module from a model.hparams config node.

    ``dtype``: compute dtype (e.g. jnp.bfloat16 for TPU inference/AMP
    training); parameters always stay float32 masters.
    """
    if name == "baseline":
        return BaselineModel(layer_config=_tupled(hparams.layer_config),
                             n_anchors=len(hparams.anchors[0]),
                             dtype=dtype)
    if name == "DyYOLO":
        return DyYOLO(layer_config=_tupled(hparams.layer_config),
                      attn_temperature=float(hparams.attn_temperature),
                      n_anchors=len(hparams.anchors[0]), dtype=dtype)
    if name == "DySOEM_SimFPN":
        return DySOEM_SimFPN(
            num_dy_conv=tuple(hparams.num_dy_conv),
            dy_kernel_size=tuple(hparams.dy_kernel_size),
            attn_temperature=float(hparams.attention_temperature),
            n_anchors=len(hparams.anchors[0]), dtype=dtype)
    raise ValueError(f"Model {name} not supported")
