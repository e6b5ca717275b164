"""TrailNet training: augmentation and the entropy-regularized loss.

Reference: `models/nets/python-layers.py` —

- `TrailAugLayer` (:70-240): per-sample top-cut, random scale+crop,
  rotation, horizontal flip with label remap (3-class: swap left/right
  labels 0<->2; 5-class: {0:4,1:3,2:2,3:1,4:0}), color/brightness/
  contrast/sharpness jitter. Reimplemented as a vmapped, jittable
  function over a PRNG key (the thread-pool becomes `vmap`).
- `CrossEntropySoftmaxWithEntropyLossLayer` (:243-313): label-smoothed
  cross entropy MINUS an entropy reward (scale 0.01, keeps predictions
  calibrated instead of overconfident — the paper's trick for smooth
  steering) PLUS a side-swap penalty (0.0001) charging probability mass
  placed on the OPPOSITE side class. The reference hand-derived the
  backward pass; here `jax.grad` of the forward is exact by
  construction (verified against finite differences in tests).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ------------------------------------------------------------------ loss


def trail_loss(logits, labels, *, ent_scale: float = 0.01,
               p_scale: float = 0.0001, label_eps: float = 0.0):
    """Per-head loss: smoothed CE - ent_scale * entropy + swap penalty.

    logits (N, 3), labels (N,) int in {0: left, 1: center, 2: right}.
    """
    logits = logits.astype(jnp.float32)
    n_cls = logits.shape[-1]
    log_sm = jax.nn.log_softmax(logits, axis=-1)
    sm = jnp.exp(log_sm)
    smooth = jnp.full((n_cls,), label_eps / (n_cls - 1), jnp.float32)
    onehot = jax.nn.one_hot(labels, n_cls)
    smooth_lab = onehot * (1.0 - label_eps - label_eps / (n_cls - 1)) \
        + smooth[None]
    ce = -jnp.sum(smooth_lab * log_sm, axis=-1)
    ent = -jnp.sum(sm * log_sm, axis=-1)
    # penalize mass on the mirror class (2 - lab); zero for center (lab=1)
    side_scale = jnp.where(labels == 1, 0.0, p_scale)
    opposite = sm[jnp.arange(sm.shape[0]), 2 - labels]
    loss = ce - ent_scale * ent + side_scale * opposite
    return jnp.mean(loss)


# -------------------------------------------------------------- augment

# Plain numpy on purpose: a module-level `jnp.array` initializes the JAX
# backend at IMPORT time, which pins the platform before callers can run
# `jax.config.update("jax_platforms", ...)` (tests force CPU that way,
# and it costs seconds of device bring-up just to import this module).
HFLIP3_REMAP = np.array([2, 1, 0])
HFLIP5_REMAP = np.array([4, 3, 2, 1, 0])


def _rotate_bilinear(img, angle_rad):
    """Rotate around the center, bilinear, edge-clamped (the reference
    rotates then crops back to size; clamp approximates the border)."""
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.mgrid[0:h, 0:w]
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    sy = cy + (yy - cy) * cos - (xx - cx) * sin
    sx = cx + (yy - cy) * sin + (xx - cx) * cos
    sy = jnp.clip(sy, 0, h - 1)
    sx = jnp.clip(sx, 0, w - 1)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    top = img[y0, x0] * (1 - wx) + img[y0, x1] * wx
    bot = img[y1, x0] * (1 - wx) + img[y1, x1] * wx
    return top * (1 - wy) + bot * wy


def augment_sample(key, img, label, *, top_cut: float = 0.0,
                   scale_max: float = 1.2, rotate_deg: float = 15.0,
                   hflip_mode: str = "hflip3",
                   color_jitter: float = 0.25):
    """One sample: (H, W, 3) float [0,1] + int label -> augmented pair."""
    h, w, _ = img.shape
    k = jax.random.split(key, 6)

    # top cut: zero-fill the cut band then stretch back (reference crops
    # the top `topCut` fraction; fixed-shape equivalent: shift content up)
    if top_cut > 0:
        cut = int(h * top_cut)
        img = jnp.concatenate([img[cut:], jnp.repeat(img[-1:], cut, 0)], 0)

    # random scale + center-ish crop via resize of a random window
    scale = jax.random.uniform(k[0], (), minval=1.0, maxval=scale_max)
    ch = jnp.maximum((h / scale).astype(jnp.int32), 1)
    cw = jnp.maximum((w / scale).astype(jnp.int32), 1)
    oy = jax.random.randint(k[1], (), 0, h) % jnp.maximum(h - ch, 1)
    ox = jax.random.randint(k[2], (), 0, w) % jnp.maximum(w - cw, 1)
    # dynamic_slice needs static sizes: gather a warped grid instead
    yy = oy + (jnp.arange(h) * (ch - 1) / (h - 1)).astype(jnp.int32)
    xx = ox + (jnp.arange(w) * (cw - 1) / (w - 1)).astype(jnp.int32)
    img = img[jnp.clip(yy, 0, h - 1)][:, jnp.clip(xx, 0, w - 1)]

    # rotation
    angle = jax.random.uniform(k[3], (), minval=-rotate_deg,
                               maxval=rotate_deg) * jnp.pi / 180.0
    img = _rotate_bilinear(img, angle)

    # horizontal flip with label remap; `label` may be a scalar or a
    # vector of per-head labels (orientation AND lateral offset both
    # mirror under a flip), all remapped with the same coin.
    do_flip = jax.random.bernoulli(k[4])
    if hflip_mode == "hflip3":
        flipped_label = jnp.asarray(HFLIP3_REMAP)[label]
    elif hflip_mode == "hflip5":
        flipped_label = jnp.asarray(HFLIP5_REMAP)[label]
    else:
        flipped_label = label
    img = jnp.where(do_flip, img[:, ::-1], img)
    label = jnp.where(do_flip, flipped_label, label)

    # brightness/contrast jitter (the PIL enhancer stack, linearized)
    b, c = jax.random.uniform(k[5], (2,), minval=1 - color_jitter,
                              maxval=1 + color_jitter)
    mean = jnp.mean(img, axis=(0, 1), keepdims=True)
    img = jnp.clip((img - mean) * c + mean * b, 0.0, 1.0)
    return img, label


def augment_batch(key, images, labels, **kwargs):
    """vmapped augmentation: (N, H, W, 3) + (N,) -> same shapes."""
    keys = jax.random.split(key, images.shape[0])
    fn = lambda k, i, l: augment_sample(k, i, l, **kwargs)  # noqa: E731
    return jax.vmap(fn)(keys, images, labels)


# ------------------------------------------------------------ train step


class TrailTrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_trailnet_train_step(optimizer: Optional[
        optax.GradientTransformation] = None, *, ent_scale: float = 0.01,
        p_scale: float = 0.0001, label_eps: float = 0.0,
        augment: bool = True):
    """Jitted TrailNet train step over the native SResNet-18.

    batch: images (N, 180, 320, 3) raw 0-255, orientation labels (N,),
    lateral-offset labels (N,). Both heads share the trunk; each gets the
    entropy-regularized loss on its own 3 logits.
    """
    from redtail_tpu.models.trailnet import trailnet_forward

    if optimizer is None:
        optimizer = optax.sgd(1e-3, momentum=0.9)

    def logits_fn(params, images):
        # True logits, not log(probs): when the softmax saturates (deep
        # un-normalized net at init), probs underflow to exact 0 and
        # log(probs+eps) has zero gradient — CE on logits keeps the
        # grad = (p - onehot) signal alive.
        return trailnet_forward(params, images, return_logits=True)

    def loss_fn(params, images, rot_labels, off_labels):
        lg_rot, lg_off = logits_fn(params, images)
        l1 = trail_loss(lg_rot, rot_labels, ent_scale=ent_scale,
                        p_scale=p_scale, label_eps=label_eps)
        l2 = trail_loss(lg_off, off_labels, ent_scale=ent_scale,
                        p_scale=p_scale, label_eps=label_eps)
        return l1 + l2, (l1, l2)

    def init_fn(params) -> TrailTrainState:
        return TrailTrainState(params, optimizer.init(params),
                               jnp.zeros((), jnp.int32))

    @jax.jit
    def step(state: TrailTrainState, key, images, rot_labels, off_labels):
        if augment:
            img01 = images / 255.0
            both = jnp.stack([rot_labels, off_labels], axis=-1)
            img01, both = augment_batch(key, img01, both)
            rot_labels, off_labels = both[:, 0], both[:, 1]
            images = img01 * 255.0
        (loss, (l1, l2)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, images, rot_labels,
                                   off_labels)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrailTrainState(params, opt_state, state.step + 1), {
            "loss": loss, "rot_loss": l1, "off_loss": l2}

    return init_fn, step
