"""Pallas kernel correctness (interpret mode on the CPU backend) against
the XLA reference ops, including the custom VJPs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from redtail_tpu.kernels import corr_cost_volume_pallas, cost_volume_pallas
from redtail_tpu.ops import corr_cost_volume, cost_volume


@pytest.fixture(scope="module")
def pair():
    rs = np.random.RandomState(0)
    left = rs.randn(2, 14, 33, 8).astype(np.float32)
    right = rs.randn(2, 14, 33, 8).astype(np.float32)
    return left, right


def test_corr_pallas_matches_xla(pair):
    left, right = pair
    want = np.asarray(corr_cost_volume(left, right, 6, keepdims=False))
    got = np.asarray(corr_cost_volume_pallas(left, right, 6))
    # kernel layout is (N, H, D, W)
    np.testing.assert_allclose(np.transpose(got, (0, 2, 1, 3)), want,
                               atol=1e-5)


def test_concat_pallas_matches_xla(pair):
    left, right = pair
    want = np.asarray(cost_volume(left, right, 6))
    got = np.asarray(cost_volume_pallas(left, right, 6))
    np.testing.assert_array_equal(got, want)


def test_corr_pallas_vjp_matches_xla(pair):
    left, right = pair
    f_ref = lambda l, r: jnp.sum(corr_cost_volume(l, r, 6) ** 2)  # noqa:E731
    f_pal = lambda l, r: jnp.sum(corr_cost_volume_pallas(l, r, 6) ** 2)  # noqa:E731
    g_ref = jax.grad(f_ref, argnums=(0, 1))(jnp.asarray(left),
                                            jnp.asarray(right))
    g_pal = jax.grad(f_pal, argnums=(0, 1))(jnp.asarray(left),
                                            jnp.asarray(right))
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pallas_path_opt_in(monkeypatch):
    from redtail_tpu.models.stereo import use_pallas_cost_volume

    monkeypatch.delenv("REDTAIL_TPU_PALLAS_CV", raising=False)
    assert not use_pallas_cost_volume()
    monkeypatch.setenv("REDTAIL_TPU_PALLAS_CV", "1")
    # still False on CPU backend (TPU-only kernel)
    assert not use_pallas_cost_volume()
