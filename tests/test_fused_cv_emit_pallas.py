"""Exactness gates for the Pallas packed-emission kernel
(`kernels/fused_cv_emit_pallas.py`) against the XLA `emit='dh_shifted'`
path of `ops/fused_cost_volume_conv.py` — interpret mode on CPU (the
kernel's production gate additionally requires the TPU backend)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

import redtail_tpu.ops.fused_cost_volume_conv as fcv
from redtail_tpu.ops.activations import elu

# (h, w, c, k_out, max_disp): odd/even h (both parity row-mask
# patterns), 8-aligned and unaligned W (the roll pad path). max_disp is
# even (the kernel's variant folding requires it — all zoo models are);
# both the leading (d=-1) and trailing (d=max_disp) zero slots run.
CASES = [(21, 40, 8, 4, 6), (22, 33, 4, 8, 8)]


def _inputs(h, w, c, k, seed):
    rs = np.random.RandomState(seed)
    return (jnp.asarray(rs.randn(1, h, w, c), jnp.float32),
            jnp.asarray(rs.randn(1, h, w, c), jnp.float32),
            jnp.asarray(rs.randn(3, 3, 3, 2 * c, k) * 0.2, jnp.float32),
            jnp.asarray(rs.randn(k), jnp.float32))


@pytest.mark.parametrize("h,w,c,k,dmax", CASES)
def test_pallas_emit_matches_xla_fp32(monkeypatch, h, w, c, k, dmax):
    left, right, wts, b = _inputs(h, w, c, k, seed=h)
    want = fcv.cost_volume_conv3d(left, right, wts, b, dmax, act=elu,
                                  emit="dh_shifted")
    monkeypatch.setattr(fcv, "use_pallas_cv_emit", lambda: True)
    got = fcv.cost_volume_conv3d(left, right, wts, b, dmax, act=elu,
                                 emit="dh_shifted")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_pallas_emit_matches_xla_bf16(monkeypatch):
    h, w, c, k, dmax = CASES[0]
    left, right, wts, b = _inputs(h, w, c, k, seed=3)
    left, right = left.astype(jnp.bfloat16), right.astype(jnp.bfloat16)
    wts = wts.astype(jnp.bfloat16)
    want = fcv.cost_volume_conv3d(left, right, wts, b, dmax, act=elu,
                                  emit="dh_shifted")
    monkeypatch.setattr(fcv, "use_pallas_cv_emit", lambda: True)
    got = fcv.cost_volume_conv3d(left, right, wts, b, dmax, act=elu,
                                 emit="dh_shifted")
    assert got.dtype == want.dtype == jnp.bfloat16
    # The kernel accumulates in fp32 and rounds once; the XLA loop adds
    # in bf16 — drift bounded by bf16 add-rounding on O(1) activations.
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.05, rtol=0.05)


def test_pallas_emit_gate_requires_optin():
    # production default stays the measured XLA path
    assert fcv.use_pallas_cv_emit() is False
