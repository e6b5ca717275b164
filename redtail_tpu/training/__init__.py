"""Training subsystems.

The reference delegated training to Caffe/DIGITS with custom Python
layers (`models/nets/python-layers.py`); here the same data augmentation
and loss live as jittable JAX functions so TrailNet (and the stereo
models, `redtail_tpu.parallel.training`) train inside the framework.
"""

from redtail_tpu.training.trailnet import (
    augment_batch,
    make_trailnet_train_step,
    trail_loss,
)

__all__ = ["trail_loss", "augment_batch", "make_trailnet_train_step"]
