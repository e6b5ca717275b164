"""Device-mesh parallelism for the stereo stack.

The reference is a single-GPU batch-1 system (SURVEY.md §2.4: no NCCL/MPI
anywhere); multi-chip scale-out is a capability this framework adds the
TPU-idiomatic way — `jax.sharding.Mesh` + sharding annotations, with XLA's
SPMD partitioner inserting the ICI collectives (halo exchanges for
spatially-sharded convs, all-reduces for data-parallel grads).
"""

from redtail_tpu.parallel.sharding import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_stereo_forward,
)
from redtail_tpu.parallel.training import (
    TrainState,
    make_train_step,
    smooth_l1_disparity_loss,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate",
    "shard_stereo_forward",
    "TrainState",
    "make_train_step",
    "smooth_l1_disparity_loss",
]
