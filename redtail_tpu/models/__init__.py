"""Model zoo: the four stereo-disparity networks (NVTiny, NVSmall,
ResNet-18 3D, ResNet18-2D), TrailNet SResNet-18, and YOLOv1."""

from redtail_tpu.models.stereo import (
    STEREO_SPECS,
    StereoSpec,
    init_stereo_params,
    load_stereo_params,
    params_from_npz,
    params_from_trt_blob,
    stereo_forward,
)

__all__ = [
    "STEREO_SPECS",
    "StereoSpec",
    "stereo_forward",
    "init_stereo_params",
    "load_stereo_params",
    "params_from_npz",
    "params_from_trt_blob",
]
