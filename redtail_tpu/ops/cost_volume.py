"""Stereo cost-volume construction (concat and correlation variants).

Semantics match the reference TF spec (`stereoDNN/scripts/
test_data_generator.py:223-259`, used by `CostVolumePlugin` /
`stereoDNN/lib/kernels.cu:50-287`): slice ``d`` pairs the left feature map
with the right feature map shifted right by ``d`` pixels (``right[x-d]``,
zero where ``x < d``).

XLA formulation: **per-disparity static slices** (one slice + pad per d,
unrolled at trace time). On a v5e this roughly halves full-model latency
versus the one-gather formulation — gathers lower poorly on TPU, while
static slices fuse into simple windowed reads (measured: ResNet18-2D
@1025x321 full model 5.0 ms vs 9.3 ms). A Pallas variant exists in
``redtail_tpu.kernels`` but loses to this under the XLA scheduler (see
that module's notes).

Layout note: the reference emits ``(D, 2C, H, W)`` (NDCHW); on TPU we keep
channels-last ``(N, D, H, W, 2C)`` so the lane dim is channels and the MXU
consumes the volume directly as conv3d input.
"""

from __future__ import annotations

import jax.numpy as jnp


def cost_volume(left, right, max_disp: int):
    """Concat cost volume: (N, H, W, C) x2 -> (N, D, H, W, 2C).

    Channels [0, C) are the left features tiled across D; channels [C, 2C)
    are the disparity-shifted right features (zero-padded), matching
    `costVolumeCopyKernel` / `costVolumeCopyPadKernel`
    (`stereoDNN/lib/kernels.cu:51-97`).
    """
    n, h, w, c = left.shape
    slices = []
    for d in range(max_disp):
        shifted = right[:, :, : w - d, :] if d else right
        if d:
            shifted = jnp.pad(shifted, ((0, 0), (0, 0), (d, 0), (0, 0)))
        slices.append(jnp.concatenate([left, shifted], axis=-1))
    return jnp.stack(slices, axis=1)


def corr_cost_volume(left, right, max_disp: int, *, keepdims: bool = True):
    """Correlation cost volume: per-disparity dot product over channels.

    (N, H, W, C) x2 -> (N, D, H, W, 1) (or (N, D, H, W) with
    ``keepdims=False``). Matches `corrCostVolumeKernel`
    (`stereoDNN/lib/kernels.cu:169-200`). Accumulates in fp32 like the
    reference's FP16 path (`kernels.cu:203-250`).
    """
    n, h, w, c = left.shape
    lf = left.astype(jnp.float32)
    rf = right.astype(jnp.float32)
    slices = []
    for d in range(max_disp):
        prod = lf[:, :, d:, :] * rf[:, :, : w - d, :]
        s = jnp.sum(prod, axis=-1)  # (N, H, W-d)
        if d:
            s = jnp.pad(s, ((0, 0), (0, 0), (d, 0)))
        slices.append(s)
    out = jnp.stack(slices, axis=1).astype(left.dtype)  # (N, D, H, W)
    return out[..., None] if keepdims else out


def corr_cost_volume_dlast(left, right, max_disp: int):
    """Correlation volume, disparity-LAST: (N, H, W, C) x2 -> (N, H, W, D)
    in fp32.

    Same math as `corr_cost_volume`; this layout keeps D on the lane axis
    so the consuming soft-argmax is a lane reduction and no transpose
    materializes — the fast path the 2D model uses.
    """
    n, h, w, c = left.shape
    lf = left.astype(jnp.float32)
    rf = right.astype(jnp.float32)
    slices = []
    for d in range(max_disp):
        prod = lf[:, :, d:, :] * rf[:, :, : w - d, :]
        s = jnp.sum(prod, axis=-1)
        if d:
            s = jnp.pad(s, ((0, 0), (0, 0), (d, 0)))
        slices.append(s)
    return jnp.stack(slices, axis=-1)  # (N, H, W, D)
