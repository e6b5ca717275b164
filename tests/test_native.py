"""Native C++ runtime tests: builds `libredtail_native.so` if the
toolchain is present, then validates preprocessing against cv2/numpy and
the lock-free mailbox semantics under a producer thread."""

import shutil
import threading

import numpy as np
import pytest

from redtail_tpu import native


@pytest.fixture(scope="module")
def lib():
    if native.load(auto_build=True) is None:
        pytest.skip("native toolchain unavailable")
    return native


def test_bilinear_matches_cv2(lib, rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.randint(0, 256, (64, 96, 3)).astype(np.uint8)
    got = lib.preprocess_bilinear(img, (32, 48))
    ref = cv2.resize(img, (48, 32), interpolation=cv2.INTER_LINEAR)
    ref = ref[:, :, ::-1].astype(np.float32) / 255.0
    # cv2 uses fixed-point interpolation; agree to ~1 LSB of u8
    assert np.abs(got - ref).max() < 2.5 / 255.0


def test_area_matches_cv2_integer_downscale(lib, rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.randint(0, 256, (64, 96, 3)).astype(np.uint8)
    got = lib.preprocess_area(img, (32, 48))
    ref = cv2.resize(img, (48, 32), interpolation=cv2.INTER_AREA)
    ref = ref[:, :, ::-1].astype(np.float32) / 255.0
    assert np.abs(got - ref).max() < 2.5 / 255.0


def test_hwc_to_chw(lib, rng):
    img = rng.rand(5, 7, 3).astype(np.float32)
    np.testing.assert_array_equal(lib.hwc_to_chw(img),
                                  img.transpose(2, 0, 1))


@pytest.mark.parametrize("shape", [(321, 1025, 3), (322, 1024, 3),
                                   (7, 9, 3), (8, 10, 1), (1, 5, 4),
                                   (2, 33, 41, 3), (6, 8, 16), (6, 8, 32)])
@pytest.mark.parametrize("swap", [True, False])
def test_pack_s2d_matches_numpy(lib, rng, shape, swap):
    """The fused serving-ingest pack (BGR->RGB + space-to-depth(2)) is
    bit-identical to `space_to_depth2_np` on flipped channels — odd/even
    H and W (zero-padded edges), batch dims, non-3-channel frames."""
    from redtail_tpu.ops.space_to_depth import space_to_depth2_np
    x = rng.randint(0, 256, shape).astype(np.uint8)
    got = lib.pack_s2d(x, swap_rb=swap)
    ref = space_to_depth2_np(x[..., ::-1] if swap else x)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_pack_s2d_fallback_without_lib(rng, monkeypatch):
    """pack_s2d degrades to the numpy path when the library isn't built."""
    monkeypatch.setattr(native, "load", lambda *a, **k: None)
    from redtail_tpu.ops.space_to_depth import space_to_depth2_np
    x = rng.randint(0, 256, (9, 11, 3)).astype(np.uint8)
    np.testing.assert_array_equal(native.pack_s2d(x, swap_rb=True),
                                  space_to_depth2_np(x[..., ::-1]))


def test_mailbox_latest_wins(lib, rng):
    mb = lib.NativeMailbox((4, 4), dtype=np.float32)
    frame, seq = mb.take(0)
    assert frame is None
    a = rng.rand(4, 4).astype(np.float32)
    b = rng.rand(4, 4).astype(np.float32)
    assert mb.publish(a) == 1
    assert mb.publish(b) == 2
    frame, seq = mb.take(0)
    assert seq == 2
    np.testing.assert_array_equal(frame, b)
    frame, seq2 = mb.take(seq)
    assert frame is None and seq2 == seq


def test_mailbox_threaded_producer(lib):
    mb = lib.NativeMailbox((16,), dtype=np.float64)
    n = 2000

    def producer():
        for i in range(1, n + 1):
            mb.publish(np.full(16, float(i)))

    t = threading.Thread(target=producer)
    t.start()
    seen = 0
    last = 0
    monotonic = True
    while t.is_alive() or True:
        frame, seq = mb.take(last)
        if frame is not None:
            # frame content must be internally consistent (no torn reads)
            vals = np.unique(frame)
            assert len(vals) == 1
            if vals[0] < seen:
                monotonic = False
            seen = max(seen, vals[0])
            last = seq
        if not t.is_alive() and frame is None:
            break
    t.join()
    assert seen == n  # final frame always observable
    assert monotonic
