"""H-packed 2D conv tests (ops/packed2d.py): exactness vs the native
convs across odd/even heights, both conventions, chains, conv1 stem
emission, and the unpack — biases randomized (round-2 lesson: zero
biases hide boundary-slot bugs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from redtail_tpu.ops import conv2d, elu
from redtail_tpu.ops.packed2d import (
    conv1_s2d_hpacked,
    conv2d_hpacked,
    conv2d_hpacked_keep,
    unpack_h2d,
)


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * 0.3)


def pack_aligned(x):
    n, h, w, c = x.shape
    hp = -(-h // 2)
    xp = jnp.pad(x, ((0, 0), (0, 2 * hp - h), (0, 0), (0, 0)))
    return jnp.concatenate([xp[:, 0::2], xp[:, 1::2]], axis=-1)


def pack_shifted(x):
    n, h, w, c = x.shape
    hp = -(-h // 2)
    xp = jnp.pad(x, ((0, 0), (1, 2 * hp + 1 - h), (0, 0), (0, 0)))
    return jnp.concatenate([xp[:, 0::2], xp[:, 1::2]], axis=-1)


@pytest.mark.parametrize("h", [8, 9, 10, 161])
def test_hpacked_flip_aligned_to_shifted(h):
    x = _rand((2, h, 13, 4))
    w = _rand((3, 3, 4, 5), 1)
    b = _rand((5,), 2)
    want = pack_shifted(conv2d(x, w, b, strides=(1, 1)))
    got = conv2d_hpacked(pack_aligned(x), w, b, h=h, in_shifted=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@pytest.mark.parametrize("h", [8, 9, 10, 161])
def test_hpacked_flip_shifted_to_aligned(h):
    x = _rand((2, h, 13, 4))
    w = _rand((3, 3, 4, 5), 1)
    b = _rand((5,), 2)
    want = pack_aligned(conv2d(x, w, b, strides=(1, 1)))
    got = conv2d_hpacked(pack_shifted(x), w, b, h=h, in_shifted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@pytest.mark.parametrize("h", [9, 12])
def test_hpacked_keep_aligned(h):
    x = _rand((1, h, 11, 4))
    w = _rand((3, 3, 4, 6), 1)
    b = _rand((6,), 2)
    want = pack_aligned(conv2d(x, w, b, strides=(1, 1)))
    got = conv2d_hpacked_keep(pack_aligned(x), w, b, h=h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@pytest.mark.parametrize("h", [8, 9, 161])
def test_hpacked_resblock_chain(h):
    """Two resblocks (4 convs, alternating conventions) + elu + skips,
    ending aligned — the production composition."""
    c = 6
    x = _rand((1, h, 15, c))
    ws = [_rand((3, 3, c, c), i + 1) for i in range(4)]
    bs = [_rand((c,), i + 10) for i in range(4)]

    ref = x
    for i in range(2):
        y = elu(conv2d(ref, ws[2 * i], bs[2 * i], strides=(1, 1)))
        y = conv2d(y, ws[2 * i + 1], bs[2 * i + 1], strides=(1, 1))
        ref = elu(y + ref)

    xp = pack_aligned(x)
    for i in range(2):
        y = conv2d_hpacked(xp, ws[2 * i], bs[2 * i], h=h,
                           in_shifted=False, act=elu)
        y = conv2d_hpacked(y, ws[2 * i + 1], bs[2 * i + 1], h=h,
                           in_shifted=True)
        xp = elu(y + xp)
        # elu(0) = 0: boundary slots stay zero through the skip+act
    np.testing.assert_allclose(np.asarray(xp),
                               np.asarray(pack_aligned(ref)), atol=1e-4)


@pytest.mark.parametrize("hw", [(18, 33), (17, 32), (321, 65)])
def test_conv1_s2d_hpacked_stem(hw):
    """s2d stem emitting H-packed aligned output == native conv1 5x5 s2
    packed after the fact (the free ingest H-pack)."""
    from redtail_tpu.ops.space_to_depth import (
        conv5s2_kernel_to_s2d, space_to_depth2)

    h, w = hw
    x = _rand((1, h, w, 3))
    w5 = _rand((5, 5, 3, 8), 1)
    b = _rand((8,), 2)
    want_full = conv2d(x, w5, b, strides=(2, 2))
    h_half = -(-h // 2)
    want = pack_aligned(want_full)
    k3 = conv5s2_kernel_to_s2d(w5, (h, w))
    got = conv1_s2d_hpacked(space_to_depth2(x), k3, b, h_half=h_half)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)


@pytest.mark.parametrize("h", [8, 9, 161])
def test_unpack_h2d(h):
    x = _rand((2, h, 13, 5))
    got = unpack_h2d(pack_aligned(x), h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-6)
