"""Regenerate the op-level golden `.bin` fixtures framework-side.

The reference generated these with TF 1.x
(`stereoDNN/scripts/test_data_generator.py`); this tool reproduces the
same cases (same seeds are NOT reproducible without TF's RNG, so data is
drawn from numpy with fixed seeds) using **torch (CPU)** as the
independent oracle for convolutions and pure numpy for the copy-style
ops — so the test suite can gate against an implementation that shares
no code with `redtail_tpu.ops`.

Writes to `tests/data/golden_ops/` in the reference's rank/dims/fp32
format; `tests/conftest.py` falls back to this directory when the
reference tree is not mounted.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from redtail_tpu.io import write_bin  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "tests" / "data" / "golden_ops"


def torch_conv3d(x_ndhwc, w_dhwio, strides, padding):
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(np.transpose(x_ndhwc, (0, 4, 1, 2, 3)))  # NCDHW
    w = torch.from_numpy(np.transpose(w_dhwio, (4, 3, 0, 1, 2)))  # OIDHW
    if padding == "SAME":
        from redtail_tpu.ops import tf_same_padding
        pads = []
        for i, s in enumerate(strides):
            lo, hi = tf_same_padding(x_ndhwc.shape[1 + i],
                                     w_dhwio.shape[i], s)
            pads.append((lo, hi))
        # torch pad order is last-dim-first: (W_lo, W_hi, H_lo, H_hi, ...)
        flat = [v for p in reversed(pads) for v in p]
        x = F.pad(x, flat)
    y = F.conv3d(x, w, stride=tuple(strides))
    return np.transpose(y.numpy(), (0, 2, 3, 4, 1))  # NDHWC


def torch_conv3d_transpose(y_ndhwc, w_dhwio, out_spatial, strides):
    """TF conv3d_transpose via torch conv_transpose3d + output cropping."""
    import torch
    import torch.nn.functional as F

    from redtail_tpu.ops import tf_same_padding
    yt = torch.from_numpy(np.transpose(y_ndhwc, (0, 4, 1, 2, 3)))
    # torch wants (in=K, out=C, D, H, W); w is DHWIO with I=C_out, O=K_in
    wt = torch.from_numpy(np.transpose(w_dhwio, (4, 3, 0, 1, 2)))
    full = F.conv_transpose3d(yt, wt, stride=tuple(strides))
    out = np.transpose(full.numpy(), (0, 2, 3, 4, 1))
    # crop TF-SAME: offset by the forward-conv's lo padding
    crop = []
    for X, k, s in zip(out_spatial, w_dhwio.shape[:3], strides):
        lo, _ = tf_same_padding(X, k, s)
        crop.append((lo, lo + X))
    return out[:, crop[0][0]:crop[0][1], crop[1][0]:crop[1][1],
               crop[2][0]:crop[2][1], :]


def np_cost_volume(left, right, max_disp):
    n, h, w, c = left.shape
    out = np.zeros((n, max_disp, h, w, 2 * c), left.dtype)
    for d in range(max_disp):
        out[:, d, :, :, :c] = left
        out[:, d, :, d:, c:] = right[:, :, : w - d, :]
    return out


def np_softargmax(x_ndhwc, scale):
    xs = x_ndhwc.astype(np.float64) * scale
    e = np.exp(xs - xs.max(axis=1, keepdims=True))
    p = e / e.sum(axis=1, keepdims=True)
    idx = np.arange(x_ndhwc.shape[1]).reshape(1, -1, 1, 1, 1)
    return (p * idx).sum(axis=1).astype(np.float32)


def ndhwc_to_ndchw(a):
    return np.transpose(a, (0, 1, 4, 2, 3))


def dhwio_to_kvcrs(a):
    return np.transpose(a, (4, 0, 3, 1, 2))


def nhwc_to_nchw(a):
    return np.transpose(a, (0, 3, 1, 2))


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    rs = np.random.RandomState(1)

    def rand(*shape):
        return rs.randn(*shape).astype(np.float32)

    # ELU
    x = 10 * rand(1, 2, 4, 3) - 5
    y = np.where(x > 0, x, np.exp(np.minimum(x, 0)) - 1).astype(np.float32)
    write_bin(nhwc_to_nchw(x), OUT / "elu_i_01.bin")
    write_bin(nhwc_to_nchw(y), OUT / "elu_o_01.bin")
    x = 10 * rand(2, 2, 3, 4, 3) - 5
    y = np.where(x > 0, x, np.exp(np.minimum(x, 0)) - 1).astype(np.float32)
    write_bin(ndhwc_to_ndchw(x), OUT / "elu_i_02.bin")
    write_bin(ndhwc_to_ndchw(y), OUT / "elu_o_02.bin")

    # Conv3D cases (same case numbering/strides as the reference suite)
    cases = {
        "01": ((1, 1, 3, 3, 3), (1, 3, 3, 3, 1), (1, 1, 1), "VALID"),
        "02": ((1, 1, 5, 5, 3), (1, 3, 3, 3, 1), (1, 2, 2), "SAME"),
        "03": ((1, 2, 3, 3, 3), (2, 3, 3, 3, 1), (1, 2, 2), "SAME"),
        "05": ((1, 8, 9, 9, 3), (3, 3, 3, 3, 4), (2, 2, 2), "SAME"),
    }
    for case, (xs, ws, strides, padding) in cases.items():
        x = rand(*xs)
        w = rand(*ws)
        y = torch_conv3d(x, w, strides, padding)
        write_bin(ndhwc_to_ndchw(x), OUT / f"conv3d_{case}_x.bin")
        write_bin(dhwio_to_kvcrs(w), OUT / f"conv3d_{case}_w.bin")
        write_bin(ndhwc_to_ndchw(y), OUT / f"conv3d_{case}_y.bin")

    # conv3d_06: strided SAME conv + bias + ELU
    x = rand(1, 8, 9, 9, 3)
    w = rand(3, 3, 3, 3, 6)
    b = rand(6)
    y = torch_conv3d(x, w, (2, 2, 2), "SAME") + b
    y = np.where(y > 0, y, np.exp(np.minimum(y, 0)) - 1).astype(np.float32)
    write_bin(ndhwc_to_ndchw(x), OUT / "conv3d_06_x.bin")
    write_bin(dhwio_to_kvcrs(w), OUT / "conv3d_06_w.bin")
    write_bin(b, OUT / "conv3d_06_b.bin")
    write_bin(ndhwc_to_ndchw(y), OUT / "conv3d_06_y.bin")

    # conv3d_07: conv s=1 then conv s=2, both SAME, shared kernel
    x = rand(1, 8, 9, 9, 3)
    w = rand(3, 3, 3, 3, 3)
    y1 = torch_conv3d(x, w, (1, 1, 1), "SAME")
    y2 = torch_conv3d(y1, w, (2, 2, 2), "SAME")
    write_bin(ndhwc_to_ndchw(x), OUT / "conv3d_07_x.bin")
    write_bin(dhwio_to_kvcrs(w), OUT / "conv3d_07_w.bin")
    write_bin(ndhwc_to_ndchw(y2), OUT / "conv3d_07_y.bin")

    # Conv3DTranspose
    tcases = {
        "01": ((1, 1, 1, 1, 1), (1, 3, 3, 3, 1), (1, 1, 3, 3, 3),
               (1, 1, 1), "VALID"),
        "02": ((1, 1, 3, 3, 1), (1, 3, 3, 3, 1), (1, 1, 5, 5, 3),
               (1, 2, 2), "SAME"),
        "03": ((1, 4, 5, 5, 8), (3, 3, 3, 4, 8), (1, 8, 9, 9, 4),
               (2, 2, 2), "SAME"),
    }
    for case, (ys, ws, xs, strides, padding) in tcases.items():
        y = rand(*ys)
        w = rand(*ws)  # VRSCK = DHWIO (I = out ch of transpose)
        if padding == "VALID":
            import torch
            import torch.nn.functional as F
            yt = torch.from_numpy(np.transpose(y, (0, 4, 1, 2, 3)))
            wt = torch.from_numpy(np.transpose(w, (4, 3, 0, 1, 2)))
            x = np.transpose(
                F.conv_transpose3d(yt, wt, stride=strides).numpy(),
                (0, 2, 3, 4, 1))
        else:
            x = torch_conv3d_transpose(y, w, xs[1:4], strides)
        # the reference stored case 03's y in NCDHW, cases 01/02 in NDCHW
        # (`test_data_generator.py:165-188`); reproduce that layout split
        y_stored = np.transpose(y, (0, 4, 1, 2, 3)) if case == "03" \
            else ndhwc_to_ndchw(y)
        write_bin(y_stored, OUT / f"conv3d_tran_{case}_y.bin")
        write_bin(dhwio_to_kvcrs(w), OUT / f"conv3d_tran_{case}_w.bin")
        write_bin(ndhwc_to_ndchw(x), OUT / f"conv3d_tran_{case}_x.bin")

    # conv3d_tran_04: strided SAME deconv + bias + ELU
    y = rand(1, 4, 5, 5, 8)
    w = rand(3, 3, 3, 4, 8)
    b = rand(4)
    x = torch_conv3d_transpose(y, w, (8, 9, 9), (2, 2, 2)) + b
    x = np.where(x > 0, x, np.exp(np.minimum(x, 0)) - 1).astype(np.float32)
    write_bin(np.transpose(y, (0, 4, 1, 2, 3)), OUT / "conv3d_tran_04_y.bin")
    write_bin(dhwio_to_kvcrs(w), OUT / "conv3d_tran_04_w.bin")
    write_bin(b, OUT / "conv3d_tran_04_b.bin")
    write_bin(ndhwc_to_ndchw(x), OUT / "conv3d_tran_04_x.bin")

    # conv3d_tran_05: two chained strided SAME deconvs
    y = rand(1, 4, 5, 5, 16)
    w1 = rand(3, 3, 3, 8, 16)
    w2 = rand(3, 3, 3, 4, 8)
    x1 = torch_conv3d_transpose(y, w1, (8, 9, 9), (2, 2, 2))
    x2 = torch_conv3d_transpose(x1, w2, (16, 17, 17), (2, 2, 2))
    write_bin(np.transpose(y, (0, 4, 1, 2, 3)), OUT / "conv3d_tran_05_y.bin")
    write_bin(dhwio_to_kvcrs(w1), OUT / "conv3d_tran_05_w1.bin")
    write_bin(dhwio_to_kvcrs(w2), OUT / "conv3d_tran_05_w2.bin")
    write_bin(ndhwc_to_ndchw(x2), OUT / "conv3d_tran_05_x.bin")

    # Cost volumes
    for case, (hw, c, d) in {"01": ((6, 6), 4, 2),
                             "02": ((32, 33), 8, 12)}.items():
        left = rand(1, hw[0], hw[1], c)
        right = rand(1, hw[0], hw[1], c)
        cv = np_cost_volume(left, right, d)
        write_bin(nhwc_to_nchw(left), OUT / f"cost_vol_{case}_l.bin")
        write_bin(nhwc_to_nchw(right), OUT / f"cost_vol_{case}_r.bin")
        write_bin(ndhwc_to_ndchw(cv), OUT / f"cost_vol_{case}_cv.bin")
    left = rand(1, 6, 6, 4)
    right = rand(1, 6, 6, 4)
    cv = np_cost_volume(left, right, 2)
    corr = (cv[..., :4] * cv[..., 4:]).sum(-1, keepdims=True)
    write_bin(nhwc_to_nchw(left), OUT / "corr_cost_vol_01_l.bin")
    write_bin(nhwc_to_nchw(right), OUT / "corr_cost_vol_01_r.bin")
    write_bin(ndhwc_to_ndchw(corr), OUT / "corr_cost_vol_01_cv.bin")

    # Softargmax / softargmin
    for case, (shape, scale) in {"01": ((1, 4, 5, 7, 1), -1.0),
                                 "02": ((2, 12, 33, 65, 1), -1.0),
                                 "03": ((1, 4, 5, 7, 1), 1.0)}.items():
        x = rand(*shape)
        y = np_softargmax(x, scale)
        write_bin(ndhwc_to_ndchw(x), OUT / f"softargmax_{case}_x.bin")
        write_bin(nhwc_to_nchw(y), OUT / f"softargmax_{case}_y.bin")

    print(f"wrote {len(list(OUT.iterdir()))} fixtures to {OUT}")


if __name__ == "__main__":
    main()
