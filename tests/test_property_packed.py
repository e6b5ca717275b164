"""Hypothesis property gates for the packed-conv algebra.

The parametrized suites (test_packed3d/test_packed2d) pin known parity
corners; these explore random shape/parity/convention combinations of
the same identities, because every packed-algebra bug found so far
(bias in pad slots, shifted-out mask family, odd-size tail slots) was a
*boundary* interaction some fixed shape set could have missed.

Derandomized (fixed example set per property) so the suite stays
deterministic; dims are kept tiny — these run on the 1-core CPU.
"""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from redtail_tpu.ops import conv2d, conv3d, conv3d_transpose, elu  # noqa: E402
from redtail_tpu.ops.packed3d import (  # noqa: E402
    conv3d_packed,
    conv3d_packed_down,
    deconv3d_packed,
    mask_form,
    pack,
    unpack_ref,
)

COMMON = dict(max_examples=25, deadline=None, derandomize=True,
              print_blob=False)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * 0.3)


dims3 = st.tuples(st.integers(2, 9), st.integers(2, 9), st.integers(2, 9))
chans = st.integers(1, 5)


@settings(**COMMON)
@given(dhw=dims3, cin=chans, cout=chans, packed_h=st.booleans(),
       in_shifted=st.booleans(), seed=st.integers(0, 10_000))
def test_conv3d_packed_matches_native(dhw, cin, cout, packed_h,
                                      in_shifted, seed):
    x = _rand((1, *dhw, cin), seed)
    w = _rand((3, 3, 3, cin, cout), seed + 1)
    b = _rand((cout,), seed + 2)
    want = conv3d(x, w, b)
    xp = pack(x, d=True, h=packed_h, shifted=in_shifted)
    yp = conv3d_packed(xp, w, b, full_spatial=dhw, packed_h=packed_h,
                       in_shifted=in_shifted)
    got = unpack_ref(yp, dhw, d=True, h=packed_h, shifted=not in_shifted)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@settings(**COMMON)
@given(dhw=dims3, cin=chans, cout=chans, packed_h=st.booleans(),
       in_shifted=st.booleans(), seed=st.integers(0, 10_000))
def test_mask_forms_bitwise_equal(dhw, cin, cout, packed_h, in_shifted,
                                  seed):
    """'mul' and 'where' pad-slot mask lowerings are the SAME function —
    the choice is a per-call-site perf knob, never a numerics one."""
    x = _rand((1, *dhw, cin), seed)
    w = _rand((3, 3, 3, cin, cout), seed + 1)
    b = _rand((cout,), seed + 2)
    xp = pack(x, d=True, h=packed_h, shifted=in_shifted)
    outs = []
    for form in ("where", "mul"):
        with mask_form(form):
            outs.append(np.asarray(
                conv3d_packed(xp, w, b, full_spatial=dhw,
                              packed_h=packed_h, in_shifted=in_shifted)))
    np.testing.assert_array_equal(outs[0], outs[1])


@settings(**COMMON)
@given(dhw=dims3, cin=chans, cout=chans, packed_h=st.booleans(),
       seed=st.integers(0, 10_000))
def test_conv3d_packed_down_matches_native(dhw, cin, cout, packed_h,
                                           seed):
    x = _rand((1, *dhw, cin), seed)
    w = _rand((3, 3, 3, cin, cout), seed + 1)
    b = _rand((cout,), seed + 2)
    want = conv3d(x, w, b, strides=(2, 2, 2))
    xp = pack(x, d=True, h=packed_h)
    yp = conv3d_packed_down(xp, w, b, full_spatial=dhw, packed_h=packed_h)
    out_dhw = tuple(-(-s // 2) for s in dhw)
    got = unpack_ref(yp, out_dhw, d=True, h=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@settings(**COMMON)
@given(in_dhw=st.tuples(st.integers(2, 6), st.integers(2, 6),
                        st.integers(2, 6)),
       odd=st.tuples(st.booleans(), st.booleans(), st.booleans()),
       cin=chans, cout=chans, pack_h=st.booleans(),
       in_packed_d=st.booleans(), seed=st.integers(0, 10_000))
def test_deconv3d_packed_matches_native(in_dhw, odd, cin, cout, pack_h,
                                        in_packed_d, seed):
    # TF conv3d_transpose s=2: out per axis is 2*in (even lo) or
    # 2*in - 1 (odd lo) — both parities drawn independently per axis.
    out_dhw = tuple(2 * i - o for i, o in zip(in_dhw, odd))
    x = _rand((1, *in_dhw, cin), seed)
    w = _rand((3, 3, 3, cout, cin), seed + 1)
    b = _rand((cout,), seed + 2)
    want = conv3d_transpose(x, w, b, out_spatial=out_dhw,
                            strides=(2, 2, 2), impl="dilated")
    xin = pack(x, d=True, h=False) if in_packed_d else x
    yp = deconv3d_packed(xin, w, b, out_spatial=out_dhw,
                         in_packed_d=in_packed_d, pack_h=pack_h)
    got = unpack_ref(yp, out_dhw, d=True, h=pack_h)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@settings(**COMMON)
@given(in_d=st.integers(2, 8), in_hw=st.tuples(st.integers(2, 6),
                                               st.integers(2, 6)),
       odd=st.tuples(st.booleans(), st.booleans(), st.booleans()),
       cin=st.integers(1, 4), h_packed=st.booleans(),
       layout=st.sampled_from(["ndhwc", "dlast"]),
       seed=st.integers(0, 10_000))
def test_dfold_packed_matches_unpacked(in_d, in_hw, odd, cin, h_packed,
                                       layout, seed):
    """The head's dfold deconv consuming the packed layouts == dfold on
    the unpacked tensor, both emission layouts, random parities."""
    from redtail_tpu.ops.convolution import conv3d_transpose_dfold

    in_dhw = (in_d, *in_hw)
    out_spatial = tuple(2 * i - o for i, o in zip(in_dhw, odd))
    x = _rand((1, *in_dhw, cin), seed)
    w = _rand((3, 3, 3, 1, cin), seed + 1)
    b = _rand((1,), seed + 2)
    want = conv3d_transpose_dfold(x, w, b, out_spatial=out_spatial)
    xp = pack(x, d=True, h=h_packed)
    got = conv3d_transpose_dfold(xp, w, b, out_spatial=out_spatial,
                                 d_packed=True, h_packed=h_packed,
                                 layout=layout)
    if layout == "dlast":
        got = jnp.transpose(got, (0, 3, 1, 2, 4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------- 2D --

def _pack2d_aligned(x):
    n, h, w, c = x.shape
    hp = -(-h // 2)
    xp = jnp.pad(x, ((0, 0), (0, 2 * hp - h), (0, 0), (0, 0)))
    return jnp.concatenate([xp[:, 0::2], xp[:, 1::2]], axis=-1)


@settings(**COMMON)
@given(h=st.integers(2, 24), w=st.integers(3, 16), c=st.integers(1, 5),
       seed=st.integers(0, 10_000))
def test_hpacked_resblock_chain(h, w, c, seed):
    """Random-size resblock pair (the production 2D composition:
    alternating conventions, elu, skips) == the native chain."""
    from redtail_tpu.ops.packed2d import conv2d_hpacked

    x = _rand((1, h, w, c), seed)
    ws = [_rand((3, 3, c, c), seed + i + 1) for i in range(4)]
    bs = [_rand((c,), seed + i + 10) for i in range(4)]

    ref = x
    for i in range(2):
        y = elu(conv2d(ref, ws[2 * i], bs[2 * i], strides=(1, 1)))
        y = conv2d(y, ws[2 * i + 1], bs[2 * i + 1], strides=(1, 1))
        ref = elu(y + ref)

    xp = _pack2d_aligned(x)
    for i in range(2):
        y = conv2d_hpacked(xp, ws[2 * i], bs[2 * i], h=h,
                           in_shifted=False, act=elu)
        y = conv2d_hpacked(y, ws[2 * i + 1], bs[2 * i + 1], h=h,
                           in_shifted=True)
        xp = elu(y + xp)
    np.testing.assert_allclose(np.asarray(xp),
                               np.asarray(_pack2d_aligned(ref)),
                               atol=1e-4)


@settings(**COMMON)
@given(h=st.integers(5, 40), w=st.integers(5, 40), cout=st.integers(1, 8),
       seed=st.integers(0, 10_000))
def test_conv1_s2d_stem_matches_native(h, w, cout, seed):
    """The serving ingest identity at random frame sizes: s2d-packed
    frame through the remapped 3x3 stem == native conv1 5x5 stride-2
    (both TF-SAME pad_begin parities land in the draw)."""
    from redtail_tpu.ops.packed2d import conv1_s2d_hpacked
    from redtail_tpu.ops.space_to_depth import (
        conv5s2_kernel_to_s2d, space_to_depth2)

    x = _rand((1, h, w, 3), seed)
    w5 = _rand((5, 5, 3, cout), seed + 1)
    b = _rand((cout,), seed + 2)
    want = _pack2d_aligned(conv2d(x, w5, b, strides=(2, 2)))
    k3 = conv5s2_kernel_to_s2d(w5, (h, w))
    got = conv1_s2d_hpacked(space_to_depth2(x), k3, b, h_half=-(-h // 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)
