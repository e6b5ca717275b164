"""Camera-frame preprocessing: host (cv2, behavior-exact) and fused
on-device (JAX) ingest paths.

Reference semantics being reproduced:

- stereo apps (`stereoDNN/sample_app/main.cpp:83-98`,
  `stereo_dnn_ros_node.cpp:42-58`): INTER_AREA resize, BGR->RGB, /255.
- `caffe_ros` (`tensor_net.cpp:303-336`): encoding conversion, float32,
  INTER_CUBIC anisotropic resize, scale, shift (TrailNet feeds raw 0-255;
  the graph's sub_mean layer normalizes).

The on-device path (`fused_ingest`) keeps frames HBM-resident: uint8
H2D transfer, then resize/convert/normalize fuse into the model's first
conv under jit — the TPU equivalent of the reference's zero-copy mapped
output buffers (`tensor_net.cpp:248-259`).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def preprocess_stereo_host(img_bgr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Exact stereo-app host path: (H0,W0,3) BGR uint8 -> (h,w,3) RGB [0,1]."""
    import cv2

    out = cv2.resize(img_bgr, (w, h), interpolation=cv2.INTER_AREA)
    out = cv2.cvtColor(out, cv2.COLOR_BGR2RGB)
    return out.astype(np.float32) / 255.0


def preprocess_caffe_host(img: np.ndarray, w: int, h: int, *,
                          encoding: str = "bgr8", inp_fmt: str = "BGR",
                          scale: float = 1.0, shift: float = 0.0
                          ) -> np.ndarray:
    """Exact `caffe_ros::preprocessImage` path (HWC float output)."""
    import cv2

    conv = {
        ("BGR", "rgb8"): cv2.COLOR_RGB2BGR,
        ("BGR", "bgra8"): cv2.COLOR_BGRA2BGR,
        ("RGB", "bgr8"): cv2.COLOR_BGR2RGB,
        ("RGB", "bgra8"): cv2.COLOR_BGRA2RGB,
    }.get((inp_fmt, encoding))
    if conv is not None:
        img = cv2.cvtColor(img, conv)
    img = img.astype(np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    if scale != 1.0:
        img = img * scale
    if shift != 0.0:
        img = img + shift
    return img


@partial(jax.jit, static_argnames=("out_hw", "bgr_to_rgb", "scale", "shift"))
def fused_ingest(frame_u8, out_hw: Tuple[int, int], *,
                 bgr_to_rgb: bool = True, scale: float = 1.0 / 255.0,
                 shift: float = 0.0):
    """On-device ingest: uint8 (N,H,W,3) -> float (N,h,w,3).

    Bilinear resize (jax.image) + channel swap + affine normalize in one
    XLA program; only the uint8 frame crosses host->HBM.
    """
    x = frame_u8
    if x.ndim == 3:
        x = x[None]
    x = x.astype(jnp.float32)
    h, w = out_hw
    if x.shape[1:3] != (h, w):
        x = jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")
    if bgr_to_rgb:
        x = x[..., ::-1]
    return x * scale + shift
