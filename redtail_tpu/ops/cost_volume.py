"""Stereo cost-volume construction (concat and correlation variants).

Semantics match the reference TF spec (`stereoDNN/scripts/
test_data_generator.py:223-259`, used by `CostVolumePlugin` /
`stereoDNN/lib/kernels.cu:50-287`): slice ``d`` pairs the left feature map
with the right feature map shifted right by ``d`` pixels (``right[x-d]``,
zero where ``x < d``).

XLA formulation: one gather along W with a validity mask — a single fused
HLO instead of the reference's two CUDA kernel launches per volume. A
VMEM-blocked Pallas variant for large volumes lives in
``redtail_tpu.kernels.cost_volume_pallas``.

Layout note: the reference emits ``(D, 2C, H, W)`` (NDCHW); on TPU we keep
channels-last ``(N, D, H, W, 2C)`` so the lane dim is channels and the MXU
consumes the volume directly as conv3d input.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shifted_right(right, max_disp):
    """(N, H, W, C) -> (N, D, H, W, C) where out[:, d, :, x] = right[:, :, x-d]."""
    n, h, w, c = right.shape
    # idx[d, x] = x - d, clamped; invalid (x < d) positions masked to zero.
    x_idx = jnp.arange(w)[None, :] - jnp.arange(max_disp)[:, None]
    valid = x_idx >= 0
    gathered = right[:, :, jnp.clip(x_idx, 0), :]          # (N, H, D, W, C)
    gathered = jnp.where(valid[None, None, :, :, None], gathered,
                         jnp.zeros((), right.dtype))
    return jnp.transpose(gathered, (0, 2, 1, 3, 4))        # (N, D, H, W, C)


def cost_volume(left, right, max_disp: int):
    """Concat cost volume: (N, H, W, C) x2 -> (N, D, H, W, 2C).

    Channels [0, C) are the left features tiled across D; channels [C, 2C)
    are the disparity-shifted right features (zero-padded), matching
    `costVolumeCopyKernel` / `costVolumeCopyPadKernel`
    (`stereoDNN/lib/kernels.cu:51-97`).
    """
    n, h, w, c = left.shape
    left_tiled = jnp.broadcast_to(left[:, None], (n, max_disp, h, w, c))
    return jnp.concatenate([left_tiled, _shifted_right(right, max_disp)],
                           axis=-1)


def corr_cost_volume(left, right, max_disp: int, *, keepdims: bool = True):
    """Correlation cost volume: per-disparity dot product over channels.

    (N, H, W, C) x2 -> (N, D, H, W, 1) (or (N, D, H, W) with
    ``keepdims=False``). Matches `corrCostVolumeKernel`
    (`stereoDNN/lib/kernels.cu:169-200`). Accumulates in fp32 like the
    reference's FP16 path (`kernels.cu:203-250` accumulates half2 into
    float).
    """
    shifted = _shifted_right(right, max_disp)
    prod = left[:, None].astype(jnp.float32) * shifted.astype(jnp.float32)
    out = jnp.sum(prod, axis=-1, keepdims=keepdims).astype(left.dtype)
    return out
