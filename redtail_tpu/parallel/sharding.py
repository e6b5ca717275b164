"""Mesh construction and sharding layouts.

Axis conventions:

- ``data``: batch (pure data parallelism — gradient all-reduce over ICI).
- ``spatial``: the image H dimension (spatial partitioning; XLA GSPMD
  inserts halo exchanges for the convolution windows automatically — the
  TPU-native analogue of "tensor parallelism" for convnets, and of the
  reference's absent multi-GPU story).

The disparity (D) axis of the 3D cost-volume models can also ride
``spatial`` for inference sharding: the cost volume is built per-device
from all-gathered W slices and the soft-argmin's softmax normalization is
the only cross-D collective.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(devices: Optional[Sequence] = None, *,
              data: Optional[int] = None,
              spatial: Optional[int] = None) -> Mesh:
    """Build a (data, spatial) mesh over the given (or all) devices.

    Defaults: all devices on ``data`` if no sizes given; otherwise the
    product must cover the device count.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None and spatial is None:
        data, spatial = n, 1
    elif data is None:
        data = n // spatial
    elif spatial is None:
        spatial = n // data
    if data * spatial != n:
        raise ValueError(f"mesh {data}x{spatial} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, *, spatial_dim: Optional[int] = 1):
    """Sharding for NHWC image batches: N over data, H over spatial."""
    spec = [None, None, None, None]
    spec[0] = DATA_AXIS
    if spatial_dim is not None:
        spec[spatial_dim] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_stereo_forward(spec, params, mesh: Mesh, *, mode: str = "image"):
    """jit a stereo forward sharded over the mesh.

    - ``mode='image'``: images sharded (N over data, H over spatial),
      params replicated. XLA partitions every conv (halo exchange on H)
      and the cost volume; the soft-argmin softmax stays local because D
      is unsharded.
    - ``mode='disparity'``: for the 3D cost-volume models — images
      replicated over ``spatial``, the cost volume and the whole 3D
      encoder/decoder sharded along the disparity axis (SURVEY.md §5's
      "long axis": volume memory/compute scales linearly in D). GSPMD
      inserts D-halo exchanges for the stride/kernel-3 conv3d chain and
      the final soft-argmin's softmax normalization becomes the only
      cross-D collective. This splits the dominant memory (the
      (D, H, W, 2C) volume) across chips — the reference had no
      multi-GPU story at all (SURVEY.md §2.4).
    """
    from redtail_tpu.models import stereo_forward
    from redtail_tpu.models.stereo import (
        _encode_pair, _volume_head, cost_volume)

    rep = replicate(mesh)
    if mode == "image":
        img_s = batch_sharding(mesh)
        return jax.jit(
            lambda p, l, r: stereo_forward(spec, p, l, r),
            in_shardings=(rep, img_s, img_s),
            out_shardings=NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS,
                                                None)),
        )
    if mode != "disparity":
        raise ValueError(f"unknown sharding mode {mode!r}")
    if spec.corr:
        raise ValueError("disparity sharding applies to the 3D "
                         "cost-volume models")
    vol_s = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))  # (N, D, ...)
    img_s = NamedSharding(mesh, P(DATA_AXIS))

    def fwd(p, l, r):
        # s2d-packed ingest frames (12ch) are half-resolution: the
        # decoder's full_hw must come from the spec, exactly as
        # stereo_forward's own guard (models/stereo.py orig_hw).
        full_hw = spec.input_hw if l.shape[-1] == 12 else l.shape[1:3]
        fl, fr, _, _ = _encode_pair(spec, p, l, r)
        vol = cost_volume(fl, fr, spec.max_disp)
        vol = jax.lax.with_sharding_constraint(vol, vol_s)
        return _volume_head(spec, p, vol, full_hw)

    return jax.jit(fwd, in_shardings=(rep, img_s, img_s),
                   out_shardings=NamedSharding(mesh, P(DATA_AXIS)))
