"""redtail_tpu — a TPU-native (JAX/XLA/Pallas) visual-navigation framework.

A from-scratch rebuild of the capabilities of NVIDIA's redtail stack
(stereo-disparity DNN family, TrailNet trail-following classifier, YOLO safety
detector, streaming perception pipeline, PX4 waypoint controller) designed for
TPU hardware: NDHWC tensors compiled by XLA onto the MXU, Pallas kernels for
the custom ops (cost volume, soft-argmax), `jax.sharding` meshes for scale-out,
and a host-side async runtime replacing the ROS node graph.

Subpackages
-----------
- ``ops``      core numerical ops (TF-semantics convs, cost volume, softargmax)
- ``kernels``  Pallas TPU kernels for the hot ops
- ``io``       weight/golden-data/checkpoint readers & writers
- ``models``   the model zoo (NVTiny/NVSmall/ResNet18/ResNet18-2D stereo,
               TrailNet, YOLO)
- ``runtime``  streaming node-graph runtime, profiler, compile cache
- ``parallel`` device-mesh sharding for multi-chip inference/training
- ``quant``    post-training int8 quantization
- ``control``  PX4-style navigation controller
"""

__version__ = "0.1.0"
