"""TF-semantics 2D/3D convolution and transposed convolution on TPU.

The reference needed ~900 lines of cuDNN descriptor plumbing
(`stereoDNN/lib/conv3d_plugin.cpp`, `conv3d_transpose_plugin.cpp`,
`conv_utils.cpp`) plus a pad-then-slice trick for asymmetric depth padding
(`stereoDNN/scripts/tensorrt_model_builder.py:422-428`) because cuDNN could
not express TF's `SAME` asymmetric padding for strided 3D (de)convolution.
XLA expresses all of it directly: `lax.conv_general_dilated` takes per-dim
`(lo, hi)` padding and lhs dilation, so the pad/slice/transform plugins have
no TPU counterpart.

Weight layouts are TF-native: HWIO for 2D, DHWIO for 3D (the reference calls
these RSCK / VRSCK, `stereoDNN/scripts/data_converters.py`). Activations are
channels-last.

All matmul-shaped work accumulates in fp32 on the MXU via
``preferred_element_type`` regardless of the (possibly bf16) input dtype.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def tf_same_padding(in_dim: int, kern_dim: int, stride_dim: int) -> Tuple[int, int]:
    """TF `SAME` padding for one dim.

    Mirrors the formula the reference converter uses
    (`tensorrt_model_builder.py:140-147`, `_compute_tf_padding`).
    """
    if in_dim % stride_dim == 0:
        pad_along = max(kern_dim - stride_dim, 0)
    else:
        pad_along = max(kern_dim - (in_dim % stride_dim), 0)
    pad_start = pad_along // 2
    return pad_start, pad_along - pad_start


def _resolve_padding(
    spatial_in: Sequence[int],
    kernel: Sequence[int],
    strides: Sequence[int],
    padding,
) -> Tuple[Tuple[int, int], ...]:
    if isinstance(padding, str):
        p = padding.upper()
        if p == "VALID":
            return tuple((0, 0) for _ in spatial_in)
        if p == "SAME":
            return tuple(
                tf_same_padding(i, k, s)
                for i, k, s in zip(spatial_in, kernel, strides)
            )
        raise ValueError(f"unknown padding {padding!r}")
    return tuple((int(lo), int(hi)) for lo, hi in padding)


def _precision_for(x, precision):
    """fp32 inputs default to exact fp32 multiplies (the TPU MXU otherwise
    rounds operands to bf16); bf16/fp16 inputs use the fast default."""
    if precision is not None:
        return precision
    if x.dtype == jnp.float32:
        return lax.Precision.HIGHEST
    return None


def _conv_nd(x, w, strides, padding, dim_nums, accum_dtype, precision):
    pads = _resolve_padding(
        x.shape[1:-1], w.shape[: x.ndim - 2], strides, padding
    )
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=tuple(strides),
        padding=pads,
        dimension_numbers=dim_nums,
        preferred_element_type=accum_dtype,
        precision=_precision_for(x, precision),
    )
    return out


def conv2d(x, w, b=None, *, strides=(1, 1), padding="SAME",
           accum_dtype=jnp.float32, precision=None):
    """2D convolution, NHWC activations, HWIO weights, TF `SAME` semantics.

    Equivalent of the reference's `network->addConvolution` layers emitted by
    `tensorrt_model_builder.py:140-228` (which stores weights KCRS; we keep
    the TF checkpoint's native RSCK/HWIO — TPU lane dim = output channels).
    """
    out = _conv_nd(x, w, strides, padding, ("NHWC", "HWIO", "NHWC"),
                   accum_dtype, precision)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def conv3d(x, w, b=None, *, strides=(1, 1, 1), padding="SAME",
           accum_dtype=jnp.float32, precision=None, impl=None):
    """3D convolution, NDHWC activations, DHWIO weights, TF `SAME` semantics.

    Replaces the reference `Conv3DPlugin` (`stereoDNN/lib/conv3d_plugin.cpp`)
    including its `Conv3DType::kTensorFlow` reshape trick
    (`conv_utils.cpp:28-72`) and the separate D-padding plugin
    (`padding_plugin.cpp`): XLA takes asymmetric (lo, hi) padding per dim.

    ``impl``: 'native' (one lax 3D conv, the default) or 'decomposed'
    (kD conv2d calls with the depth axis folded into batch). Measured on a
    v5e: decomposed wins ~24% on an isolated conv3D_1-shaped layer but
    LOSES in full-model context (NVSmall 126 vs 101 ms — the pad/slice/
    add glue breaks XLA's cross-layer fusion), so native stays default.
    """
    if impl is None:
        impl = "native"
    if impl == "decomposed":
        out = _conv3d_decomposed(x, w, strides, padding, accum_dtype,
                                 precision)
    else:
        out = _conv_nd(x, w, strides, padding, ("NDHWC", "DHWIO", "NDHWC"),
                       accum_dtype, precision)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def _conv3d_decomposed(x, w, strides, padding, accum_dtype, precision):
    """conv3d as kD depth-slices of conv2d with D folded into batch.

    y[:, do] = sum_kd conv2d(x[:, do*sd + kd - pad_lo], w[kd]); the D
    gather is a strided slice, each kd contributes one big batched 2D
    conv (batch = N*D_out) that XLA tiles onto the MXU far better than
    its 3D path."""
    n, d, h, ww, c = x.shape
    kd, kh, kw = w.shape[:3]
    sd, sh, sw = strides
    (pd_lo, pd_hi), ph, pw = _resolve_padding((d, h, ww), (kd, kh, kw),
                                              strides, padding)
    xp = jnp.pad(x, ((0, 0), (pd_lo, pd_hi), (0, 0), (0, 0), (0, 0)))
    dp = xp.shape[1]
    d_out = (dp - kd) // sd + 1
    acc = None
    for k in range(kd):
        xs = lax.slice_in_dim(xp, k, k + sd * (d_out - 1) + 1, sd, axis=1)
        xb = xs.reshape(n * d_out, h, ww, c)
        y = lax.conv_general_dilated(
            xb, w[k], (sh, sw), [ph, pw],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=accum_dtype,
            precision=_precision_for(x, precision))
        acc = y if acc is None else acc + y
    return acc.reshape(n, d_out, *acc.shape[1:])


def _conv_nd_transpose(y, w, out_spatial, strides, padding, dim_letters,
                       accum_dtype, precision):
    """Gradient-of-conv transposed convolution with explicit output shape.

    TF defines `conv2d_transpose`/`conv3d_transpose` as the gradient of the
    forward convolution that maps `output_shape -> y.shape`. We build that
    operation directly as a dilated convolution:

      - lhs dilation = forward stride,
      - kernel spatially flipped with I/O swapped (expressed via dimension
        numbers, no data movement),
      - padding per dim: lo' = k - 1 - lo,  hi' = X + lo - s*(Y-1) - 1,
        where (lo, hi) is the forward TF-SAME padding for input size X.

    This reproduces the reference `Conv3DTransposePlugin`
    (`conv3d_transpose_plugin.cpp`, `cudnnConvolutionBackwardData`) including
    the asymmetric-D case the reference had to emulate with an enlarged
    output plus a `SlicePlugin` (`tensorrt_model_builder.py:422-428`).
    """
    nd = len(out_spatial)
    kernel = w.shape[:nd]
    y_spatial = y.shape[1:-1]
    same = padding.upper() == "SAME"
    pads = []
    for X, Y, k, s in zip(out_spatial, y_spatial, kernel, strides):
        lo = tf_same_padding(X, k, s)[0] if same else 0
        lo_t = k - 1 - lo
        hi_t = X + lo - s * (Y - 1) - 1
        pads.append((lo_t, hi_t))
    spatial = dim_letters  # e.g. "DHW"
    # Forward kernel is {spatial}IO mapping C->K; the transpose maps K->C.
    # Declaring the layout as {spatial}OI swaps I/O without moving data.
    dn = (f"N{spatial}C", f"{spatial}OI", f"N{spatial}C")
    w_flipped = jnp.flip(w, axis=tuple(range(nd)))
    out = lax.conv_general_dilated(
        y,
        w_flipped,
        window_strides=(1,) * nd,
        padding=pads,
        lhs_dilation=tuple(strides),
        dimension_numbers=dn,
        preferred_element_type=accum_dtype,
        precision=_precision_for(y, precision),
    )
    return out


def conv2d_transpose(y, w, b=None, *, out_spatial, strides=(2, 2),
                     padding="SAME", accum_dtype=jnp.float32, precision=None):
    """TF `conv2d_transpose`: NHWC activations, HWIO weights (I = output
    channels of the transpose, O = input channels — TF filter convention).

    Replaces the reference's `network->addDeconvolution` layers
    (`tensorrt_model_builder.py:230-288`).
    """
    out = _conv_nd_transpose(y, w, tuple(out_spatial), strides, padding, "HW",
                             accum_dtype, precision)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(y.dtype)


def conv3d_transpose(y, w, b=None, *, out_spatial, strides=(2, 2, 2),
                     padding="SAME", accum_dtype=jnp.float32, precision=None):
    """TF `conv3d_transpose`: NDHWC activations, DHWIO weights.

    Replaces `Conv3DTransposePlugin` + `SlicePlugin`
    (`stereoDNN/lib/conv3d_transpose_plugin.cpp`, `slice_plugin.cpp`).
    """
    out = _conv_nd_transpose(y, w, tuple(out_spatial), strides, padding, "DHW",
                             accum_dtype, precision)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(y.dtype)
