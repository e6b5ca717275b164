"""Distributed training step for the stereo models.

The reference delegated training to external Caffe/DIGITS and TF rigs
(`/root/reference/models/`, SURVEY.md §2.2) — this framework carries its own
jitted, mesh-sharded training step so the full lifecycle (train → quantize →
serve) happens in one system.

Layout: batch over ``data``, image H over ``spatial`` (GSPMD halo
exchanges); parameters and optimizer state replicated, gradients
all-reduced over ICI by XLA. `jax.checkpoint` wraps the 3D-volume head to
rematerialize the cost volume in backward — the (D, H, W, 2C) volume is the
memory peak and recomputing it is far cheaper than holding it in HBM.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from redtail_tpu.models import stereo_forward
from redtail_tpu.ops.convolution import plain_lowering
from redtail_tpu.parallel.sharding import batch_sharding, replicate


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def smooth_l1_disparity_loss(pred, target, mask=None, delta: float = 1.0):
    """Huber/smooth-L1 on disparity maps, masked mean (mask=valid px)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    err = pred - target
    abs_err = jnp.abs(err)
    loss = jnp.where(abs_err < delta, 0.5 * err * err / delta,
                     abs_err - 0.5 * delta)
    if mask is None:
        return jnp.mean(loss)
    mask = mask.astype(jnp.float32)
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(spec, optimizer: Optional[optax.GradientTransformation]
                    = None, mesh=None, remat: bool = True,
                    compute_dtype=None):
    """Build `(init_fn, step_fn)` for one stereo model.

    - ``init_fn(params) -> TrainState``
    - ``step_fn(state, left, right, target_disp, valid) -> (state, metrics)``

    With a mesh, the step is jitted with explicit shardings (batch over
    data, H over spatial, state replicated).

    ``compute_dtype`` (e.g. ``jnp.bfloat16``): mixed-precision training —
    master weights and optimizer moments stay in the params' dtype
    (fp32), the forward/backward convs run with operands cast down
    (fp32 MXU accumulation via ``preferred_element_type``; the conv
    backward is the `ops.convolution._mixed_accum_conv` custom_vjp —
    JAX's stock conv grad rule rejects the mixed-dtype form). Loss and
    metrics are always fp32.

    The forward traces under `ops.convolution.plain_lowering`: every
    layer is the one strided/dilated conv the spec names — the packed
    serving restructures are inference-latency forms whose backward
    cost/shape is unvalidated, and `jax.checkpoint` remat of the plain
    graph is what the memory plan was sized for.
    """
    if optimizer is None:
        optimizer = optax.adam(1e-4)

    def forward(params, left, right):
        with plain_lowering():
            pred = stereo_forward(spec, params, left, right)
        if spec.corr:
            # The correlation model's head is a sigmoid normalized to
            # [0,1] of the input width (`resnet18_2D_513x257_net.cpp`
            # head; px = out * w, `main.cpp:325-327`) — scale to px so
            # the loss target and EPE are in pixel units like the
            # 3D-volume models.
            pred = pred * spec.input_hw[1]
        return pred

    if remat:
        forward = jax.checkpoint(
            forward, policy=jax.checkpoint_policies.nothing_saveable)

    def loss_fn(params, left, right, target, valid):
        if compute_dtype is not None:
            cast = lambda a: (a.astype(compute_dtype)
                              if jnp.issubdtype(a.dtype, jnp.floating)
                              else a)
            params = jax.tree_util.tree_map(cast, params)
            left, right = cast(left), cast(right)
        pred = forward(params, left, right)
        loss = smooth_l1_disparity_loss(pred, target, valid)
        return loss, pred

    def init_fn(params) -> TrainState:
        return TrainState(params, optimizer.init(params),
                          jnp.zeros((), jnp.int32))

    def step(state: TrainState, left, right, target, valid):
        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, left, right, target, valid)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        epe = smooth_l1_disparity_loss(pred, target, valid, delta=1e-9)
        metrics = {"loss": loss, "epe": epe}
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return init_fn, jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from redtail_tpu.parallel.sharding import DATA_AXIS, SPATIAL_AXIS

    img_s = batch_sharding(mesh)
    nhw = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None))
    rep = replicate(mesh)

    step_jit = jax.jit(
        step,
        in_shardings=(rep, img_s, img_s, nhw, nhw),
        out_shardings=(rep, rep),
    )
    return init_fn, step_jit
