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


def shard_stereo_forward(spec, params, mesh: Mesh):
    """jit a stereo forward sharded over the mesh.

    Images are sharded (N over data, H over spatial); params replicated.
    XLA partitions every conv (with halo exchange on H) and the cost-volume
    gather; the soft-argmin softmax stays local because D is unsharded.
    """
    from redtail_tpu.models import stereo_forward

    img_s = batch_sharding(mesh)
    rep = replicate(mesh)

    fn = jax.jit(
        lambda p, l, r: stereo_forward(spec, p, l, r),
        in_shardings=(rep, img_s, img_s),
        out_shardings=NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None)),
    )
    return fn
