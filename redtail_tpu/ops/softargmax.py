"""Soft-argmax / soft-argmin disparity regression over the D axis.

Reference: `SoftargmaxPlugin` (`stereoDNN/lib/softargmax_plugin.cpp`) chains
four cuDNN calls (scale by -1, softmax, multiply-by-iota, reduce). TF spec:
`test_data_generator.py:301-315`. Here it is one fused XLA expression; the
softmax runs in fp32 for the same stability reason the reference pins fp32
cuDNN descriptors on its FP16 path (`softargmax_plugin.cpp:260-268`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softargmax(x, *, axis: int = 1, scale: float = 1.0):
    """sum(softmax(scale * x, axis) * arange(D)) — removes `axis`.

    For a volume (N, D, H, W, C) with ``axis=1`` returns (N, H, W, C):
    the expected index under the softmax distribution.
    """
    d = x.shape[axis]
    xf = x.astype(jnp.float32) * scale
    prob = jax.nn.softmax(xf, axis=axis)
    idx_shape = [1] * x.ndim
    idx_shape[axis] = d
    idx = jnp.arange(d, dtype=jnp.float32).reshape(idx_shape)
    out = jnp.sum(prob * idx, axis=axis)
    return out.astype(x.dtype)


def softargmin(x, *, axis: int = 1):
    """Soft-argmin (`SoftargmaxType::kMin`): softargmax of the negated input."""
    return softargmax(x, axis=axis, scale=-1.0)
