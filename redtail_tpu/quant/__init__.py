"""Post-training INT8 quantization.

Replaces the reference's TensorRT INT8 path (`Int8EntropyCalibrator`,
`ros/packages/caffe_ros/src/int8_calibrator.cpp` + TRT's builder): KL-
divergence (entropy) threshold calibration from activation histograms,
symmetric per-channel weight quantization, and int8 matmul/conv execution
on the MXU (int8 x int8 -> int32 accumulate).
"""

from redtail_tpu.quant.ptq import (
    CalibrationCollector,
    calibrate_caffe_net,
    conv2d_w8,
    entropy_threshold,
    quantize_per_channel,
    quantize_stereo_params_w8,
)

__all__ = [
    "entropy_threshold",
    "quantize_per_channel",
    "conv2d_w8",
    "quantize_stereo_params_w8",
    "CalibrationCollector",
    "calibrate_caffe_net",
]
