"""Core numerical ops with TensorFlow-compatible semantics, XLA-first.

The reference implemented these as TensorRT plugins over cuDNN + hand-written
CUDA (`/root/reference/stereoDNN/lib/*.cpp`, `kernels.cu`). On TPU the whole
plugin layer collapses into pure JAX functions: XLA natively supports 3D
convolution, transposed convolution, asymmetric padding, permutes and slices,
so only the genuinely custom ops (cost volume, soft-argmax) get dedicated
Pallas kernels (see ``redtail_tpu.kernels``).

Layout convention: channels-last (NHWC / NDHWC), the TPU-native layout — the
lane dimension maps to channels. The reference's NCHW/NC2HW2 formats were
cuDNN/TensorRT artifacts and are not reproduced.
"""

from redtail_tpu.ops.activations import elu, srelu, sigmoid
from redtail_tpu.ops.convolution import (
    conv2d,
    conv2d_transpose,
    conv3d,
    conv3d_transpose,
    tf_same_padding,
)
from redtail_tpu.ops.cost_volume import corr_cost_volume, cost_volume
from redtail_tpu.ops.softargmax import softargmax, softargmin

__all__ = [
    "elu",
    "srelu",
    "sigmoid",
    "conv2d",
    "conv2d_transpose",
    "conv3d",
    "conv3d_transpose",
    "tf_same_padding",
    "cost_volume",
    "corr_cost_volume",
    "softargmax",
    "softargmin",
]
