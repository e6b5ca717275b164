"""Property-based convolution tests: random shapes/strides vs torch (an
oracle sharing no code with redtail_tpu or the golden generators)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from redtail_tpu.ops import (  # noqa: E402
    conv2d,
    conv2d_transpose,
    conv3d,
    tf_same_padding,
)

RS = np.random.RandomState(7)


def _torch_conv2d_same(x, w, stride):
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
    pads = []
    for i, s in enumerate(stride):
        lo, hi = tf_same_padding(x.shape[1 + i], w.shape[i], s)
        pads.append((lo, hi))
    xt = F.pad(xt, (pads[1][0], pads[1][1], pads[0][0], pads[0][1]))
    y = F.conv2d(xt, wt, stride=stride)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("trial", range(8))
def test_conv2d_same_matches_torch(trial):
    h = int(RS.randint(4, 40))
    w_ = int(RS.randint(4, 40))
    cin = int(RS.randint(1, 9))
    cout = int(RS.randint(1, 9))
    k = int(RS.choice([1, 3, 5]))
    s = int(RS.choice([1, 2, 3]))
    x = RS.randn(2, h, w_, cin).astype(np.float32)
    w = RS.randn(k, k, cin, cout).astype(np.float32)
    want = _torch_conv2d_same(x, w, (s, s))
    got = np.asarray(conv2d(x, w, strides=(s, s)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("trial", range(5))
def test_conv3d_same_matches_torch(trial):
    d = int(RS.randint(2, 10))
    h = int(RS.randint(3, 14))
    w_ = int(RS.randint(3, 14))
    cin = int(RS.randint(1, 5))
    cout = int(RS.randint(1, 5))
    s = int(RS.choice([1, 2]))
    x = RS.randn(1, d, h, w_, cin).astype(np.float32)
    w = RS.randn(3, 3, 3, cin, cout).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    wt = torch.from_numpy(np.transpose(w, (4, 3, 0, 1, 2)))
    pads = []
    for i, dim in enumerate((d, h, w_)):
        pads.append(tf_same_padding(dim, 3, s))
    xt = F.pad(xt, (pads[2][0], pads[2][1], pads[1][0], pads[1][1],
                    pads[0][0], pads[0][1]))
    want = np.transpose(F.conv3d(xt, wt, stride=s).numpy(), (0, 2, 3, 4, 1))
    got = np.asarray(conv3d(x, w, strides=(s, s, s)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("trial", range(5))
def test_conv2d_transpose_matches_torch(trial):
    # TF conv2d_transpose SAME == torch conv_transpose2d with padding/
    # output_padding chosen from the TF lo pad.
    yh = int(RS.randint(3, 12))
    yw = int(RS.randint(3, 12))
    cin = int(RS.randint(1, 6))
    cout = int(RS.randint(1, 6))
    oh = int(RS.choice([2 * yh, 2 * yh - 1]))
    ow = int(RS.choice([2 * yw, 2 * yw - 1]))
    y = RS.randn(1, yh, yw, cin).astype(np.float32)
    w = RS.randn(3, 3, cout, cin).astype(np.float32)
    got = np.asarray(conv2d_transpose(y, w, out_spatial=(oh, ow),
                                      strides=(2, 2), impl="dilated"))
    yt = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))
    # torch wants (in, out, kh, kw); deposit semantics match TF's
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
    full = F.conv_transpose2d(yt, wt, stride=2)  # (1, cout, 2yh+1, 2yw+1)
    lo_h = tf_same_padding(oh, 3, 2)[0]
    lo_w = tf_same_padding(ow, 3, 2)[0]
    want = full.numpy()[:, :, lo_h:lo_h + oh, lo_w:lo_w + ow]
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                               atol=1e-3, rtol=1e-3)
