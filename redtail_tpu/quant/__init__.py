"""Post-training INT8 quantization.

Replaces the reference's TensorRT INT8 path (`Int8EntropyCalibrator`,
`ros/packages/caffe_ros/src/int8_calibrator.cpp` + TRT's builder): KL-
divergence (entropy) threshold calibration from activation histograms,
symmetric per-channel weight quantization, and int8 matmul/conv execution
on the MXU (int8 x int8 -> int32 accumulate).
"""

from redtail_tpu.quant.stereo_int8 import (
    calibrate_stereo,
    int8_layer_paths,
    quantize_stereo_params_int8,
)
from redtail_tpu.quant.ptq import (
    CalibrationCollector,
    amax_threshold,
    caffe_net_forward_int8,
    calibrate_caffe_net,
    calibrate_or_load,
    conv2d_int8,
    conv2d_w8,
    entropy_threshold,
    load_calibration,
    quantize_act,
    quantize_per_channel,
    quantize_stereo_params_w8,
    save_calibration,
)

__all__ = [
    "entropy_threshold",
    "amax_threshold",
    "quantize_per_channel",
    "quantize_act",
    "conv2d_int8",
    "conv2d_w8",
    "quantize_stereo_params_w8",
    "CalibrationCollector",
    "calibrate_caffe_net",
    "caffe_net_forward_int8",
    "calibrate_or_load",
    "save_calibration",
    "load_calibration",
    "calibrate_stereo",
    "quantize_stereo_params_int8",
    "int8_layer_paths",
]
