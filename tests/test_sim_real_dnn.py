"""Real-DNN closed-loop sim: renderer geometry + TrailNet-in-the-loop.

The reference's SITL rig ran the actual perception stack on rendered
frames (`tools/simulation/docker/`, SURVEY.md L8); these gates cover the
framework's native equivalent: `render_trail_view` (ground-plane raycast
camera), per-class labeled sampling, and `sim_app --real-dnn` closing
the control loop through the real `trailnet_forward` with the committed
synthetic-trained weights.
"""

from pathlib import Path

import numpy as np
import pytest

from redtail_tpu.apps.sim_app import (DEFAULT_TRAILNET_WEIGHTS, Trail,
                                      render_trail_view, run_sim,
                                      sample_labeled_view)


def test_render_trail_view_geometry():
    """Centered pose: dirt under the camera, grass to the sides, sky on
    top; pointing left of the trail puts the trail in the right half."""
    trail = Trail()
    rng = np.random.RandomState(0)
    img = render_trail_view(trail, 0.0, trail.y(0.0), trail.heading(0.0),
                            rng=rng)
    assert img.shape == (180, 320, 3)
    assert 0 <= img.min() and img.max() <= 255
    h, w, _ = img.shape
    bottom = img[-20:]
    center = bottom[:, w // 2 - 10:w // 2 + 10]
    side = bottom[:, :40]
    # dirt is red-heavy, grass green-heavy
    assert (center[..., 0] - center[..., 1]).mean() > 10
    assert (side[..., 0] - side[..., 1]).mean() < -10
    sky = img[:20]
    assert (sky[..., 2] - sky[..., 0]).mean() > 30  # blue-heavy

    # view class 0 = pointing LEFT of the trail -> trail renders RIGHT
    img2 = render_trail_view(trail, 0.0, trail.y(0.0),
                             trail.heading(0.0) + 0.3, rng=rng)
    rg = img2[-30:, :, 0] - img2[-30:, :, 1]
    assert rg[:, w // 2:].clip(0).sum() > 3 * rg[:, :w // 2].clip(0).sum()


def test_sample_labeled_view_covers_grid():
    trail = Trail()
    rng = np.random.RandomState(1)
    seen = set()
    for _ in range(80):
        _, v, s = sample_labeled_view(trail, rng)
        seen.add((v, s))
    assert seen == {(v, s) for v in range(3) for s in range(3)}


needs_weights = pytest.mark.skipif(
    not Path(DEFAULT_TRAILNET_WEIGHTS).exists(),
    reason="committed TrailNet weights missing")


@needs_weights
def test_real_dnn_sim_bounded_cross_track():
    """The REAL TrailNet graph (synthetic-trained committed weights) in
    the closed loop holds the vehicle on the trail — the reference's
    SITL success criterion, with the actual network doing perception."""
    from redtail_tpu.apps.sim_app import make_real_trailnet

    result = run_sim(steps=150, classifier=make_real_trailnet())
    assert result["max_cross_track"] < 5.0, result
    assert result["distance_x"] > 20.0, result
    assert result["ai_score"] > 0.5, result


@needs_weights
def test_trailnet_w8_roundtrip_classifies():
    """The committed w8 artifact decodes to a tree the real forward
    accepts, and its probabilities are valid distributions."""
    import jax.numpy as jnp

    from redtail_tpu.models.trailnet import (params_from_w8_npz,
                                             trailnet_forward)

    params = params_from_w8_npz(DEFAULT_TRAILNET_WEIGHTS)
    trail = Trail()
    rng = np.random.RandomState(2)
    img, v, s = sample_labeled_view(trail, rng)
    probs = np.asarray(trailnet_forward(params, jnp.asarray(img[None])),
                       np.float32)[0]
    assert probs.shape == (6,)
    np.testing.assert_allclose(probs[:3].sum(), 1.0, atol=1e-3)
    np.testing.assert_allclose(probs[3:].sum(), 1.0, atol=1e-3)
