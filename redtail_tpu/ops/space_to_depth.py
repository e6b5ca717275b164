"""Space-to-depth ingest packing for the stride-2 stem convolution.

Every stereo spec's conv1 is a 5x5 stride-2 conv from 3 channels
(`resnet18_2D_513x257_net.cpp` conv1; `model_nvsmall.py:24`): at c_in=3
it fills 3 of the MXU's 128 lanes and measures 0.8 TFLOP/s on a v5e.
Packing 2x2 pixel blocks into channels (c_in 3->12, or 24 for the
block-diagonal fused towers) turns it into an exactly-equivalent 3x3
stride-1 conv, measured ~6x faster (tools/microbench_enc2d.py).

The pack itself is only worth it when it rides the ingest: a standalone
in-graph transpose costs more than the conv saves (round-1 measurement),
so `stereo_forward` ACCEPTS pre-packed (N, ceil(H/2), ceil(W/2), 12)
inputs — the serving nodes and bench feed them — and the pack runs
fused into the on-device ingest (or as an identity-weight conv; see
`space_to_depth2` impls, all measured in tools/microbench_enc2d.py).

Kernel algebra (per axis; TF-SAME, k=5, s=2, pad_begin p0 in {1, 2}):
output i reads original rows 2i - p0 + dy, dy in [0, 5); s2d row i+t
phase q holds original row 2(i+t) + q, so dy = 2t + q + p0 - ... i.e.
k3[t+1, q] = w5[2t + q + p0 - 2 + 2] with out-of-range taps zero — both
input parities (p0 = 2 odd sizes, p0 = 1 even) map exactly onto a 3-tap
stride-1 conv over the packed image with its own TF-SAME padding.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from redtail_tpu.ops.convolution import tf_same_padding


def s2d_hw(hw: Tuple[int, int]) -> Tuple[int, int]:
    """Packed spatial size for an original (H, W)."""
    return -(-hw[0] // 2), -(-hw[1] // 2)


def space_to_depth2(x, *, impl: str = "slices"):
    """(N, H, W, C) -> (N, ceil(H/2), ceil(W/2), 4C).

    Channel layout is phase-major (py, px, c): out[..., (2*py+px)*C + c]
    = x[:, 2i+py, 2j+px, c], odd H/W zero-padded at the end (matching
    conv1's TF-SAME zero rows).  ``impl``:

    - 'slices': 4 strided slices + concat (production default),
    - 'reshape': 6D reshape/transpose (XLA layout-change copy),
    - 'conv': identity-weight k=2 s=2 conv — the pack runs on the MXU
      (same trick as packed3d's conv-only unpack).
    """
    n, h, w, c = x.shape
    hp, wp = -(-h // 2), -(-w // 2)
    if impl == "conv":
        from jax import lax
        k = np.zeros((2, 2, c, 4 * c), np.float32)
        for py in (0, 1):
            for px in (0, 1):
                for ch in range(c):
                    k[py, px, ch, (2 * py + px) * c + ch] = 1.0
        return lax.conv_general_dilated(
            x, jnp.asarray(k, x.dtype), (2, 2),
            [(0, 2 * hp - h), (0, 2 * wp - w)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
    xp = jnp.pad(x, ((0, 0), (0, 2 * hp - h), (0, 2 * wp - w), (0, 0)))
    if impl == "reshape":
        xp = xp.reshape(n, hp, 2, wp, 2, c)
        return xp.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp, wp, 4 * c)
    assert impl == "slices", impl
    return jnp.concatenate([xp[:, py::2, px::2]
                            for py in (0, 1) for px in (0, 1)], axis=-1)


def space_to_depth2_np(x: np.ndarray) -> np.ndarray:
    """Host (numpy) pack, any leading batch dims: (..., H, W, C) ->
    (..., ceil(H/2), ceil(W/2), 4C), same phase-major layout.

    This is the production ingest path: every ON-DEVICE pack form
    measured slower than the conv1 win it enables (slices 2.6 ms,
    reshape-composed +0.73 ms, identity-conv-composed +0.03 ms at
    flagship size — tools/microbench_enc2d.py), while the host pack is
    a handful of strided copies that overlap device compute in the
    pipelined node graph (and H2D bytes are unchanged)."""
    h, w = x.shape[-3:-1]
    hp, wp = -(-h // 2), -(-w // 2)
    pad = [(0, 0)] * (x.ndim - 3) + [(0, 2 * hp - h), (0, 2 * wp - w),
                                     (0, 0)]
    xp = np.pad(x, pad)
    return np.concatenate([xp[..., py::2, px::2, :]
                           for py in (0, 1) for px in (0, 1)], axis=-1)


def use_s2d_stem() -> bool:
    """s2d-packed ingest + 3x3 stem: default ON on TPU
    (REDTAIL_TPU_S2D=0/1 overrides)."""
    import os

    import jax
    v = os.environ.get("REDTAIL_TPU_S2D")
    if v is not None:
        return v == "1"
    return jax.default_backend() == "tpu"


def conv5s2_kernel_to_s2d(w5, in_hw: Tuple[int, int]):
    """(5, 5, Ci, Co) stride-2 TF-SAME kernel -> the equivalent
    (3, 3, 4*Ci, Co) stride-1 kernel over `space_to_depth2` input.

    ``in_hw`` is the ORIGINAL image size — its parity fixes the TF-SAME
    pad_begin (2 for odd, 1 for even) that the tap remap depends on.
    """
    p0h = tf_same_padding(in_hw[0], 5, 2)[0]
    p0w = tf_same_padding(in_hw[1], 5, 2)[0]
    ci, co = w5.shape[2], w5.shape[3]
    # Pad dy/dx range to [-1, 6) so out-of-range taps index a zero row.
    wpad = jnp.pad(w5, ((1, 1), (1, 1), (0, 0), (0, 0)))
    dy = np.array([[2 * t + q + p0h - 2 + 1 for q in (0, 1)]
                   for t in range(3)])             # (ty, py), +1 for pad
    dx = np.array([[2 * t + q + p0w - 2 + 1 for q in (0, 1)]
                   for t in range(3)])
    k = wpad[dy.reshape(-1)][:, dx.reshape(-1)]    # (6, 6, ci, co)
    k = k.reshape(3, 2, 3, 2, ci, co)              # (ty, py, tx, px, ci, co)
    # s2d channel layout is (py, px, c) phase-major:
    k = k.transpose(0, 2, 1, 3, 4, 5)              # (ty, tx, py, px, ci, co)
    return k.reshape(3, 3, 4 * ci, co)
