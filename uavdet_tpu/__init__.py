"""uavdet_tpu — TPU-native multimodal UAV detection framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``alfialdo/multimodal-uav-det`` (reference mounted at /root/reference):
anchor-based single-class YOLO-style detectors for the Anti-UAV-RGBT
dataset (paired RGB + infrared video), trained through a two-stage
pipeline with a params.yaml-compatible config surface.

Layers (bottom → top):
  utils/     config, pytree datatypes, seeding, debug guards
  ops/       pure jittable numerics: boxes, target encoding, decoding,
             losses, NMS, mAP, preprocessing, dynamic-conv kernels
  models/    flax.linen model zoo: BaselineModel, DyYOLO, DySOEM_SimFPN,
             RTMUAVDet (deprecated, parity with reference)
  data/      Anti-UAV index builder + host pipeline + device prefetch
  parallel/  jax.sharding.Mesh setup, DP/FSDP sharding rules
  training/  optax optimizers/schedules, train loop, orbax checkpoints,
             DVCLive-compatible metric emission
"""

__version__ = "0.1.0"
