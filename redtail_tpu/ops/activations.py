"""Activations used by the model zoo.

- ``elu``: reference `EluPlugin` (`stereoDNN/lib/elu_plugin.cpp`,
  `cudnnActivationForward` with CUDNN_ACTIVATION_ELU).
- ``srelu``: TrailNet's "shifted ReLU", the Scale(+1) -> ReLU -> Scale(-1)
  triplet in the Caffe prototxt
  (`models/pretrained/TrailNet_SResNet-18.prototxt`, emitted by
  `tensorrt_model_builder.py:write_srelu`): relu(x + 1) - 1.
- ``sigmoid``: ResNet18-2D's output head producing normalized disparity
  (`resnet18_2D_513x257_net.cpp`, scaled by image width downstream,
  `sample_app/main.cpp:325-327`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def elu(x):
    return jax.nn.elu(x)


def srelu(x):
    one = jnp.asarray(1.0, x.dtype)
    return jnp.maximum(x + one, 0) - one


def sigmoid(x):
    return jax.nn.sigmoid(x)
