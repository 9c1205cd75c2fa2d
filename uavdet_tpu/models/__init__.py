"""Model zoo — parity with reference model/__init__.py:1-3.

``RTMUAVDet`` is intentionally NOT exported (deprecated in the reference,
model/RTMUAVDet.py:313); import it explicitly from
``uavdet_tpu.models.rtm_uav_det`` if needed.
"""

from .layers import (
    ConvModule,
    CNNBlock,
    ResidualBlock,
    ScalePrediction,
    DyConvModule,
    ObjectnessHead,
    BBoxHead,
    YOLOHead,
)
from .baseline import BaselineModel
from .dy_yolo import DyYOLO
from .dysoem_simfpn import DySOEM_SimFPN
from .registry import build_model
