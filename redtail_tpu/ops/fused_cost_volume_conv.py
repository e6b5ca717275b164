"""Fused concat-cost-volume + first conv3d.

The concat cost volume V (N, D, H, W, 2C) is *structured*
(`kernels.cu:51-97` semantics):

    V[d, h, x, 0:C]  = left[h, x]            (constant across d)
    V[d, h, x, C:2C] = right[h, x - d]       (0 where x < d)

so the network's first 3x3x3 stride-1 conv3d over V factors exactly:

- **left half**: every depth tap kd sees the same left map, so the
  interior-d output is ONE conv2d with the depth-summed kernel; the two
  boundary depths (d = 0, D-1) just drop one tap's conv2d.
- **right half**: conv2d commutes with the disparity shift up to a
  1-column boundary term — conv2d(shift(right, d'), w) equals
  shift(conv2d(right, w), d') everywhere except column x = d'-1, which
  gains w[:, 2] (the right-most kernel column) applied to right's
  column 0. Three conv2d + D shifted adds + a rank-1 correction replace
  the dense 3D convolution.

Net effect per model: the (D, H, W, 2C) volume (about 1 GB in NVSmall at
1025x321) is never materialized, and the heaviest conv3d's FLOPs drop
~16x (2 x 3 conv2d on the C-channel feature maps instead of D sweeps of a
2C-channel 3D stencil). This restructuring is exact (fp32-tested against
cost_volume + conv3d) — an optimization the reference's TRT plugin
pipeline could not express across its plugin boundary.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from redtail_tpu.ops.convolution import _precision_for


def _conv2d_nhwc(x, w, accum_dtype=jnp.float32, precision=None):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype,
        precision=_precision_for(x, precision))


def cost_volume_conv3d(left, right, w, b=None, max_disp: int = 48,
                       *, precision=None):
    """left/right (N, H, W, C) + conv3d weights w (3, 3, 3, 2C, K) ->
    conv3d(cost_volume(left, right, D), w, stride 1, SAME): (N, D, H, W, K).
    """
    n, h, wd, c = left.shape
    kd, kh, kw, c2, k_out = w.shape
    assert kd == 3 and c2 == 2 * c, (w.shape, c)
    w_l = w[:, :, :, :c, :]
    w_r = w[:, :, :, c:, :]

    # Left half: 3 taps' conv2d; interior d uses the depth-summed kernel.
    a = [_conv2d_nhwc(left, w_l[i], precision=precision) for i in range(3)]
    a_sum = a[0] + a[1] + a[2]

    # Right half taps.
    bk = [_conv2d_nhwc(right, w_r[i], precision=precision) for i in range(3)]
    # Boundary corrections. conv2d(shift(right, d')) differs from
    # shift(conv2d(right), d') in exactly two columns, both through the
    # kernel's right column (kw index 2):
    #   x = d'-1 gains  sum_kh w_r[i, kh, 2] . right[h+kh-1, 0]
    #   x = W-1  loses  sum_kh w_r[i, kh, 2] . right[h+kh-1, W-d']
    # cc[i][:, :, x] is that vertical conv at column x (kw=1 conv).
    cc = [_conv2d_nhwc(right, w_r[i][:, 2:3], precision=precision)
          for i in range(3)]  # each (N, H, W, K) fp32

    cols = jnp.arange(wd)
    last_col = (cols == wd - 1).astype(jnp.float32)[None, None, :, None]
    out = []
    for d in range(max_disp):
        acc = a_sum
        if d == 0:
            acc = acc - a[0]
        if d == max_disp - 1:
            acc = acc - a[2]
        for i in range(3):
            dp = d + i - 1  # depth tap hits volume slice d' = d + kd - 1
            if dp < 0 or dp >= max_disp:
                continue
            if dp == 0:
                acc = acc + bk[i]
                continue
            shifted = jnp.pad(
                bk[i][:, :, : wd - dp], ((0, 0), (0, 0), (dp, 0), (0, 0)))
            onehot = (cols == dp - 1).astype(jnp.float32)
            shifted = shifted \
                + cc[i][:, :, 0][:, :, None, :] * onehot[None, None, :, None] \
                - cc[i][:, :, wd - dp][:, :, None, :] * last_col
            acc = acc + shifted
        out.append(acc)
    y = jnp.stack(out, axis=1)  # (N, D, H, W, K) fp32
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(left.dtype)
