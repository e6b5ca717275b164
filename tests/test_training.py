"""TrailNet training tests: the entropy-regularized loss (validated
against a direct numpy port of the reference layer's forward math and
finite differences), the augmentation invariants, and a full train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from redtail_tpu.training import (
    augment_batch,
    make_trailnet_train_step,
    trail_loss,
)
from redtail_tpu.training.trailnet import augment_sample


def numpy_reference_loss(logits, labels, ent_scale=0.01, p_scale=0.0001,
                         label_eps=0.0):
    """Direct port of the reference forward math
    (`python-layers.py:263-283`) for cross-checking."""
    total = 0.0
    for lgt, lab in zip(logits, labels):
        a = lgt.max()
        lse = a + np.log(np.exp(lgt - a).sum())
        sm = np.exp(lgt - lse)
        smooth = np.full(3, label_eps / 2)
        smooth[lab] = 1.0 - label_eps
        ce = -np.sum(smooth * (lgt - lse))
        ent = -np.sum(sm * (lgt - lse))
        loss = ce - ent_scale * ent
        scale = [p_scale, 0.0, p_scale]
        loss += scale[lab] * sm[2 - lab]
        total += loss
    return total / len(logits)


def test_trail_loss_matches_reference_math(rng):
    logits = rng.randn(8, 3).astype(np.float32) * 3
    labels = rng.randint(0, 3, 8)
    want = numpy_reference_loss(logits, labels, label_eps=0.05)
    got = float(trail_loss(jnp.asarray(logits), jnp.asarray(labels),
                           label_eps=0.05))
    assert got == pytest.approx(want, rel=1e-5)


def test_trail_loss_gradient_finite_difference(rng):
    logits = rng.randn(4, 3).astype(np.float64)
    labels = rng.randint(0, 3, 4)
    f = lambda x: trail_loss(x, jnp.asarray(labels))  # noqa: E731
    g = np.asarray(jax.grad(lambda x: f(x))(jnp.asarray(logits,
                                                        jnp.float32)))
    eps = 1e-3
    for i in range(4):
        for j in range(3):
            lp = logits.copy()
            lp[i, j] += eps
            lm = logits.copy()
            lm[i, j] -= eps
            fd = (float(f(jnp.asarray(lp, jnp.float32)))
                  - float(f(jnp.asarray(lm, jnp.float32)))) / (2 * eps)
            assert g[i, j] == pytest.approx(fd, abs=2e-3)


def test_entropy_reward_prefers_calibrated(rng):
    # With the entropy reward, an overconfident correct prediction loses
    # to a calibrated one at equal CE... directly: entropy term lowers
    # loss for higher-entropy outputs.
    labels = jnp.array([1])
    sharp = jnp.array([[0.0, 10.0, 0.0]])
    soft = jnp.array([[0.0, 2.0, 0.0]])
    l_sharp = float(trail_loss(sharp, labels, ent_scale=0.0))
    l_sharp_ent = float(trail_loss(sharp, labels, ent_scale=0.5))
    l_soft = float(trail_loss(soft, labels, ent_scale=0.0))
    l_soft_ent = float(trail_loss(soft, labels, ent_scale=0.5))
    assert (l_soft_ent - l_soft) < (l_sharp_ent - l_sharp)


def test_swap_penalty_targets_opposite_side():
    labels = jnp.array([0])
    mass_on_opposite = jnp.array([[1.0, 0.0, 5.0]])
    mass_on_center = jnp.array([[1.0, 5.0, 0.0]])
    big_p = dict(p_scale=10.0, ent_scale=0.0)
    no_p = dict(p_scale=0.0, ent_scale=0.0)
    delta_opp = float(trail_loss(mass_on_opposite, labels, **big_p)) - \
        float(trail_loss(mass_on_opposite, labels, **no_p))
    delta_ctr = float(trail_loss(mass_on_center, labels, **big_p)) - \
        float(trail_loss(mass_on_center, labels, **no_p))
    assert delta_opp > delta_ctr > 0


# -------------------------------------------------------------- augment


def test_augment_shapes_and_ranges(rng):
    imgs = rng.rand(4, 32, 48, 3).astype(np.float32)
    labels = jnp.array([0, 1, 2, 0])
    out, lab = augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs),
                             labels)
    assert out.shape == imgs.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert lab.shape == labels.shape


def test_hflip_label_remap_deterministic(rng):
    img = jnp.asarray(rng.rand(16, 24, 3), jnp.float32)
    flips = {0: 0, 1: 0, 2: 0}
    remapped = []
    for s in range(40):
        _, lab = augment_sample(jax.random.PRNGKey(s), img, jnp.array(0),
                                scale_max=1.0, rotate_deg=0.0,
                                color_jitter=0.0)
        remapped.append(int(lab))
    # label 0 either stays 0 (no flip) or becomes 2 (flip); never 1
    assert set(remapped) == {0, 2}


def test_dual_head_labels_flip_together(rng):
    img = jnp.asarray(rng.rand(16, 24, 3), jnp.float32)
    for s in range(20):
        _, labs = augment_sample(jax.random.PRNGKey(s), img,
                                 jnp.array([0, 2]), scale_max=1.0,
                                 rotate_deg=0.0, color_jitter=0.0)
        labs = np.asarray(labs)
        assert tuple(labs) in {(0, 2), (2, 0)}  # same coin for both heads


# ----------------------------------------------------------- train step


def test_trailnet_train_step_decreases_loss():
    from redtail_tpu.models.trailnet import init_trailnet_params

    import optax

    rng = np.random.RandomState(42)  # local: independent of test order
    params = init_trailnet_params(jax.random.PRNGKey(0))
    init_fn, step = make_trailnet_train_step(optax.adam(3e-4),
                                             augment=False)
    state = init_fn(params)
    imgs = rng.randint(0, 256, (2, 180, 320, 3)).astype(np.float32)
    rot = np.array([0, 2], np.int32)
    off = np.array([1, 1], np.int32)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        state, metrics = step(state, key, imgs, rot, off)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[2:]) < losses[0]  # memorizes a 2-sample batch


# ------------------------------------------------------------- dataset


def test_build_trail_lists_and_balance(tmp_path, rng):
    from redtail_tpu.data import TrailsDataset, build_trail_lists

    cv2 = pytest.importorskip("cv2")
    # synthesize <root>/<video>/<class>/*.png with unbalanced classes
    counts = {"lc": 2, "sc": 5, "rc": 3}
    for video in ("000", "001"):
        for cls, n in counts.items():
            d = tmp_path / video / cls
            d.mkdir(parents=True)
            for i in range(n):
                cv2.imwrite(str(d / f"{i}.png"),
                            rng.randint(0, 255, (8, 8, 3)).astype(np.uint8))
    lists = build_trail_lists(tmp_path, splits={"val": ("001",)})
    # train (video 000) balanced to 3 * max(counts) = 15
    assert len(lists["train"]) == 15
    train_labels = [l for _, l in lists["train"]]
    assert train_labels.count(0) == train_labels.count(1) == \
        train_labels.count(2) == 5
    # val unbalanced
    assert len(lists["val"]) == 10
    ds = TrailsDataset(lists["train"], image_hw=(16, 16))
    batch = next(ds.batches(4))
    assert batch[0].shape == (4, 16, 16, 3)
    assert batch[1].shape == (4,)
