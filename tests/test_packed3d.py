"""Exactness gates for the channel-packed conv3d reformulations.

Every packed op must reproduce its native counterpart bit-for-bit in
fp32 (both are the same sums reordered; tolerance covers accumulation
order only) across odd/even D/H/W and both lo parities.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from redtail_tpu.ops import conv3d, conv3d_transpose
from redtail_tpu.ops.packed3d import (
    conv3d_packed,
    conv3d_packed_down,
    conv3d_packed_down_unpack,
    deconv3d_to_packed,
    pack,
    unpack,
)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape),
                       jnp.float32)


@pytest.mark.parametrize("dhw", [(8, 10, 12), (7, 9, 11), (6, 9, 12),
                                 (5, 6, 7)])
@pytest.mark.parametrize("packed_h", [True, False])
def test_pack_unpack_roundtrip(dhw, packed_h):
    x = _rand((2, *dhw, 3))
    xp = pack(x, d=True, h=packed_h)
    assert xp.shape[-1] == (4 if packed_h else 2) * 3
    got = unpack(xp, dhw, d=True, h=packed_h)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x))


@pytest.mark.parametrize("dhw", [(8, 10, 12), (7, 9, 11), (6, 9, 13),
                                 (5, 8, 7)])
@pytest.mark.parametrize("packed_h", [True, False])
def test_conv3d_packed_matches_native(dhw, packed_h):
    cin, cout = 4, 5
    x = _rand((2, *dhw, cin))
    w = _rand((3, 3, 3, cin, cout), 1) * 0.2
    b = _rand((cout,), 2)
    want = conv3d(x, w, b)
    xp = pack(x, d=True, h=packed_h)
    yp = conv3d_packed(xp, w, b, full_spatial=dhw, packed_h=packed_h)
    got = unpack(yp, dhw, d=True, h=packed_h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv3d_packed_composes():
    """Two packed convs back to back == two native convs (checks the
    pad-slot invariant: garbage in odd-size slots would leak)."""
    dhw = (7, 9, 11)
    x = _rand((1, *dhw, 4))
    w1 = _rand((3, 3, 3, 4, 6), 1) * 0.2
    w2 = _rand((3, 3, 3, 6, 4), 2) * 0.2
    want = conv3d(conv3d(x, w1), w2)
    xp = pack(x, d=True, h=True)
    yp = conv3d_packed(conv3d_packed(xp, w1, full_spatial=dhw),
                       w2, full_spatial=dhw)
    got = unpack(yp, dhw, d=True, h=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("dhw", [(8, 10, 12), (7, 9, 11), (6, 9, 13),
                                 (17, 21, 15)])
@pytest.mark.parametrize("packed_h", [True, False])
def test_conv3d_packed_down_matches_native(dhw, packed_h):
    cin, cout = 4, 5
    x = _rand((2, *dhw, cin))
    w = _rand((3, 3, 3, cin, cout), 1) * 0.2
    b = _rand((cout,), 2)
    want = conv3d(x, w, b, strides=(2, 2, 2))
    xp = pack(x, d=True, h=packed_h)
    yp = conv3d_packed_down(xp, w, b, full_spatial=dhw, packed_h=packed_h)
    out_dhw = tuple(-(-s // 2) for s in dhw)
    got = unpack(yp, out_dhw, d=True, h=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("dhw", [(8, 10, 12), (7, 9, 11), (17, 21, 15),
                                 (12, 9, 13)])
def test_conv3d_packed_down_unpack_matches_native(dhw):
    cin, cout = 4, 6
    x = _rand((2, *dhw, cin))
    w = _rand((3, 3, 3, cin, cout), 1) * 0.2
    b = _rand((cout,), 2)
    want = conv3d(x, w, b, strides=(2, 2, 2))
    xp = pack(x, d=True, h=False)
    got = conv3d_packed_down_unpack(xp, w, b, full_spatial=dhw)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("in_dhw,out_dhw", [
    ((4, 5, 6), (8, 10, 12)),
    ((4, 5, 6), (7, 9, 11)),
    ((5, 3, 7), (9, 6, 13)),
])
@pytest.mark.parametrize("pack_h", [True, False])
def test_deconv3d_to_packed_matches_native(in_dhw, out_dhw, pack_h):
    cin, cout = 5, 4
    x = _rand((2, *in_dhw, cin))
    w = _rand((3, 3, 3, cout, cin), 1) * 0.2
    b = _rand((cout,), 2)
    want = conv3d_transpose(x, w, b, out_spatial=out_dhw,
                            strides=(2, 2, 2), impl="dilated")
    yp = deconv3d_to_packed(x, w, b, out_spatial=out_dhw, pack_h=pack_h)
    got = unpack(yp, out_dhw, d=True, h=pack_h)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("model", ["nvtiny", "nvsmall", "resnet18"])
def test_packed_head_matches_native_forward(model, monkeypatch):
    """Full packed 3D pipeline == the native volume head, small shapes
    (exercises every layout transition of all three 3D specs)."""
    import dataclasses

    from redtail_tpu.models import (STEREO_SPECS, init_stereo_params,
                                    stereo_forward)

    spec = dataclasses.replace(STEREO_SPECS[model], input_hw=(34, 66),
                               max_disp=8)
    params = init_stereo_params(spec)
    left = _rand((1, 34, 66, 3), 3) * 0.5 + 0.5
    right = _rand((1, 34, 66, 3), 4) * 0.5 + 0.5

    monkeypatch.setenv("REDTAIL_TPU_PACKED3D", "0")
    want = np.asarray(stereo_forward(spec, params, left, right))
    monkeypatch.setenv("REDTAIL_TPU_PACKED3D", "1")
    got = np.asarray(stereo_forward(spec, params, left, right))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)
