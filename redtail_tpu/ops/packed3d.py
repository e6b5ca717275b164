"""Channel-packed 3D convolutions: fold D/H pairs into channels.

Why: the 3D stereo models (NVTiny/NVSmall/ResNet-18, SURVEY §2.3) run
their heaviest convolutions at 16-64 channels — 32 of the MXU's 128
lanes on the full-resolution cost volume — and measure at 4-15% MFU
(NVSmall conv3D_2: 14.2 ms for 219 GFLOP ≈ 7.8%).  Folding pairs of
depth (and height) slices into the channel dimension runs the same
convolution at 64-128 channels, trading a 1.33-1.78x dense-FLOP
overhead for full MXU lanes.  This is TPU-only restructuring with no
reference counterpart (the TRT plugins, `stereoDNN/lib/conv3d_plugin.cpp`,
ran cuDNN at the native widths).

Layout
------
``pack(x, d=True, h=True)``: (N, D, H, W, C) -> (N, Dp, Hp, W, G*C) with
Dp = ceil(D/2), Hp = ceil(H/2) and channel groups in **(ph, pd, c)**
order (H-parity slowest).  Odd sizes are zero-padded; every packed op
re-zeroes the padded slots so the invariant "pad slots are exactly the
TF-SAME zero padding" composes through the whole 3D stack.

Index algebra (per packed axis, original conv k=3 TF-SAME)
----------------------------------------------------------
Stride 1 (lo = 1): output slot (j, r) needs inputs [2j+r-1, 2j+r+1];
the union over r is [2j-1, 2j+2], which aligns with the *shifted pair
view* Xs[a] = (X[2a-1], X[2a]) as exactly two taps a ∈ {j, j+1}.  The
packed kernel entry for tap s, input parity q, output parity r is the
original tap t = 2s + q - r (zero outside 0..2) — 6 of 8 blocks
non-zero per axis (the 1.33x).

Stride 2, packed in and out (lo ∈ {0,1}): taps s ∈ {0,1,2} at stride 2
over the packed axis with t = 2s + q - 2r + lo... (see `_A_down`).

Stride 2, packed in, UNPACKED out (the H axis of the downsample layers,
whose odd sizes make packed outputs awkward): two taps over the shifted
view with t = 2s + q - 1 + lo (`_A_down_unpack`).

Transposed conv k=3 s=2 (`deconv3d_to_packed`): the deposit relation
o = 2i - lo + t means output pair (o2, r) reads inputs {o2-1+lo, o2+lo}
— a k=2 conv over the *unpacked* input with pad (1-lo, lo) and
t = r + 2 - 2s - lo (`_A_deconv`); all 8 output parities are computed
as channels and the unpacked output dims are woven back.

All ops are numerically exact vs their native counterparts (fp32-gated
in tests/test_packed3d.py, odd and even sizes).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from redtail_tpu.ops.convolution import (_precision_for, _weave_axis,
                                         tf_same_padding)


# ------------------------------------------------------------ pack/unpack


def _pad_to_even(x, axis):
    if x.shape[axis] % 2:
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, 1)
        x = jnp.pad(x, pads)
    return x


def pack(x, *, d: bool = True, h: bool = False):
    """(N, D, H, W, C) -> packed (N, Dp, H[p], W, G*C), groups (ph, pd, c)."""
    assert x.ndim == 5
    if d:
        x = _pad_to_even(x, 1)
        n, d2, hh, ww, c = x.shape[0], x.shape[1] // 2, *x.shape[2:]
        x = x.reshape(n, d2, 2, hh, ww, c)
        x = jnp.moveaxis(x, 2, 4)  # (N, Dp, H, W, 2, C)
        x = x.reshape(n, d2, hh, ww, 2 * c)
    if h:
        x = _pad_to_even(x, 2)
        n, dp, h2, ww, c = x.shape[0], x.shape[1], x.shape[2] // 2, *x.shape[3:]
        x = x.reshape(n, dp, h2, 2, ww, c)
        x = jnp.moveaxis(x, 3, 4)  # (N, Dp, Hp, W, 2, G*C)
        x = x.reshape(n, dp, h2, ww, 2 * c)
    return x


def unpack(x, full_spatial: Tuple[int, int, int], *, d: bool = True,
           h: bool = False):
    """Inverse of `pack`: slices away the odd-size zero pads."""
    dd, hh, ww = full_spatial
    n = x.shape[0]
    if h:
        dp, h2, w, c2 = x.shape[1:]
        x = x.reshape(n, dp, h2, w, 2, c2 // 2)
        x = jnp.moveaxis(x, 4, 3)
        x = x.reshape(n, dp, 2 * h2, w, c2 // 2)
        x = x[:, :, :hh]
    if d:
        dp, h_, w, c2 = x.shape[1:]
        x = x.reshape(n, dp, h_, w, 2, c2 // 2)
        x = jnp.moveaxis(x, 4, 2)
        x = x.reshape(n, 2 * dp, h_, w, c2 // 2)
        x = x[:, :dd]
    return x


def _zero_pad_slots(yp, full_spatial, *, d: bool, h: bool):
    """Re-zero the channel slots that represent odd-size padding, so the
    invariant "pad slots == TF-SAME zeros" survives every packed op."""
    dd, hh = full_spatial[0], full_spatial[1]
    need_d = d and dd % 2 == 1
    need_h = h and hh % 2 == 1
    if not (need_d or need_h):
        return yp
    n, dp, hp, w, cg = yp.shape
    gd, gh = (2 if d else 1), (2 if h else 1)
    v = yp.reshape(n, dp, hp, w, gh, gd, cg // (gd * gh))
    if need_h:
        v = v.at[:, :, -1, :, 1].set(0.0)
    if need_d:
        v = v.at[:, -1, :, :, :, 1].set(0.0)
    return v.reshape(n, dp, hp, w, cg)


def _shift_view(xp, axis, *, group_pos: int, n_groups: int):
    """Shifted pair view along a packed axis: Xs[a] = (X[2a-1], X[2a]),
    length Lp+1.  ``group_pos``: index of this axis's parity factor in the
    channel-group tuple (0 = slowest), ``n_groups``: total group factors."""
    n_lead = xp.ndim - 1
    c_total = xp.shape[-1]
    base = xp.reshape(*xp.shape[:-1], *((2,) * n_groups),
                      c_total >> n_groups)
    pdim = n_lead + group_pos
    p0 = lax.index_in_dim(base, 0, axis=pdim, keepdims=False)
    p1 = lax.index_in_dim(base, 1, axis=pdim, keepdims=False)
    zshape = list(p0.shape)
    zshape[axis] = 1
    z = jnp.zeros(zshape, xp.dtype)
    q0 = jnp.concatenate([z, p1], axis=axis)   # X[2a-1]
    q1 = jnp.concatenate([p0, z], axis=axis)   # X[2a]
    out = jnp.stack([q0, q1], axis=pdim)
    return out.reshape(*out.shape[:n_lead], c_total)


# ----------------------------------------------------- kernel band tables


def _A_s1(lo: int = 1) -> np.ndarray:
    """A[s, q, r, t] for stride-1 packed axis (shift view, 2 taps)."""
    A = np.zeros((2, 2, 2, 3), np.float32)
    for s in range(2):
        for q in range(2):
            for r in range(2):
                t = 2 * s + q - r
                if 0 <= t <= 2:
                    A[s, q, r, t] = 1.0
    return A


def _A_down_unpack(lo: int) -> np.ndarray:
    """A[s, q, t] for stride-2 packed-in UNPACKED-out axis (2 taps over
    the shifted view, output steps the pair axis by 1)."""
    A = np.zeros((2, 2, 3), np.float32)
    for s in range(2):
        for q in range(2):
            t = 2 * s + q - 1 + lo
            if 0 <= t <= 2:
                A[s, q, t] = 1.0
    return A


def _A_deconv(lo: int) -> np.ndarray:
    """A[s, r, t] for transposed k=3 s=2: 2 taps over the unpacked input
    with pad (1-lo, lo); t = r + 2 - 2s - lo."""
    A = np.zeros((2, 2, 3), np.float32)
    for s in range(2):
        for r in range(2):
            t = r + 2 - 2 * s - lo
            if 0 <= t <= 2:
                A[s, r, t] = 1.0
    return A


def _A_identity() -> np.ndarray:
    """A[t0, q0, r0, t] trivial table for an unpacked stride-1 axis
    (3 taps, no parities)."""
    A = np.zeros((3, 1, 1, 3), np.float32)
    for t in range(3):
        A[t, 0, 0, t] = 1.0
    return A


def _banded_kernel(w, A_d, A_h, A_w):
    """Compose per-axis band tables into the packed conv kernel.

    w: (3, 3, 3, Ci, Co).  A_*: (S, Q, R, T) per axis.  Returns
    (Sd, Sh, Sw, Qh*Qd*Ci, Rh*Rd*Co) — channel groups (ph, pd, c), and
    W-axis parities (if any) appended innermost on the OUTPUT side is
    not supported here (W never packs in this pipeline).
    """
    Ad = jnp.asarray(A_d, w.dtype)
    Ah = jnp.asarray(A_h, w.dtype)
    Aw = jnp.asarray(A_w, w.dtype)
    # K[a,b,e, p,q, i, s,r, o] = sum_{t,u,v} Ad[a,q,r,t] Ah[b,p,s,u]
    #                                        Aw[e,1,1,v] w[t,u,v,i,o]
    k = jnp.einsum("aqrt,bpsu,exyv,tuvio->abepqisro",
                   Ad, Ah, Aw, w)
    Sd, Sh, Sw = k.shape[0], k.shape[1], k.shape[2]
    qh, qd, ci = k.shape[3], k.shape[4], k.shape[5]
    rh, rd, co = k.shape[6], k.shape[7], k.shape[8]
    return k.reshape(Sd, Sh, Sw, qh * qd * ci, rh * rd * co)


def _conv(x, k, strides, pads, accum_dtype, precision):
    return lax.conv_general_dilated(
        x, k, strides, pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=accum_dtype,
        precision=_precision_for(x, precision))


def _bias(out, b, groups: int):
    if b is None:
        return out
    return out + jnp.tile(b, (groups,)).astype(out.dtype)


# ------------------------------------------------------------- packed ops


def conv3d_packed(xp, w, b=None, *, full_spatial, packed_h: bool = True,
                  accum_dtype=jnp.float32, precision=None):
    """Stride-1 k=3^3 TF-SAME conv3d on a packed tensor (D, and
    optionally H, folded into channels).  (N,Dp,Hp,W,G*Ci) -> same shape
    with G*Co channels."""
    D, H, W = full_spatial
    n_groups = 2 if packed_h else 1
    xs = _shift_view(xp, 1, group_pos=n_groups - 1, n_groups=n_groups)
    if packed_h:
        xs = _shift_view(xs, 2, group_pos=0, n_groups=n_groups)
    A_h = _A_s1() if packed_h else _A_identity()
    k = _banded_kernel(w, _A_s1(), A_h, _A_identity())
    pads = [(0, 0), (0, 0) if packed_h else (1, 1), (1, 1)]
    out = _conv(xs, k, (1, 1, 1), pads, accum_dtype, precision)
    out = _bias(out, b, 2 * n_groups)
    out = _zero_pad_slots(out, full_spatial, d=True, h=packed_h)
    return out.astype(xp.dtype)


def conv3d_packed_down(xp, w, b=None, *, full_spatial, packed_h: bool = True,
                       accum_dtype=jnp.float32, precision=None):
    """Stride-2 k=3^3 TF-SAME conv3d, packed input -> D-packed output
    (output H/W are unpacked; H uses the shifted-view 2-tap form).

    full_spatial: the ORIGINAL (D, H, W) of the unpacked input.
    Output: (N, ceil(Dout/2), Hout, Wout, 2*Co), Dout = ceil(D/2) etc.
    """
    D, H, W = full_spatial
    d_out = -(-D // 2)
    h_out = -(-H // 2)
    w_out = -(-W // 2)
    lo_d = tf_same_padding(D, 3, 2)[0]
    lo_h = tf_same_padding(H, 3, 2)[0]
    lo_w, hi_w = tf_same_padding(W, 3, 2)

    n_groups = 2 if packed_h else 1
    xs = _shift_view(xp, 2, group_pos=0, n_groups=n_groups) if packed_h \
        else xp
    # D taps read packed index 2*o2 + s (lo folded into the band table);
    # when lo_d == 1 the first tap reads one pair earlier: pad 1 low.
    # Max index needed: 2*(ceil(d_out/2)-1) + 2.
    d_pairs = xs.shape[1]
    d_out2 = -(-d_out // 2)
    lead = 1 if lo_d == 1 else 0
    need = 2 * (d_out2 - 1) + 2 + 1 - lead
    pad_d = (lead, max(0, need - d_pairs))
    A_d = _A_down3(lo_d)
    A_h = _A_down_unpack(lo_h) if packed_h else None
    if packed_h:
        Ah4 = np.zeros((2, 2, 1, 3), np.float32)
        Ah4[:, :, 0, :] = A_h
    else:
        Ah4 = np.zeros((3, 1, 1, 3), np.float32)
        for t in range(3):
            Ah4[t, 0, 0, t] = 1.0
    # output has no H parity: R_h = 1
    k = _banded_kernel_down(w, A_d, Ah4)
    pads = [pad_d,
            (0, 0) if packed_h else (lo_h, tf_same_padding(H, 3, 2)[1]),
            (lo_w, hi_w)]
    out = _conv(xs, k, (2, 1, 2) if packed_h else (2, 2, 2), pads,
                accum_dtype, precision)
    out = _bias(out, b, 2)
    out = _zero_pad_slots(out, (d_out, h_out, w_out), d=True, h=False)
    return out.astype(xp.dtype)


def _A_down3(lo: int) -> np.ndarray:
    """A[s, q, r, t] for the stride-2 packed-in packed-out D axis.

    Output pair (o2, r) at original depth 2*o2+r has window base
    2*(2*o2+r) - lo; with the input padded `lead = lo` pairs low, tap s
    reads padded pair 2*o2 + s = real pair 2*o2 + s - lead, so real
    depth d_in = 2*(2*o2 + s - lead) + q and
    t = d_in - (4*o2 + 2*r - lo) = 2*(s - lead) + q - 2*r + lo."""
    lead = 1 if lo == 1 else 0
    A = np.zeros((3, 2, 2, 3), np.float32)
    for s in range(3):
        for q in range(2):
            for r in range(2):
                t = 2 * (s - lead) + q - 2 * r + lo
                if 0 <= t <= 2:
                    A[s, q, r, t] = 1.0
    return A


def _banded_kernel_down(w, A_d, A_h):
    """Downsample kernel: D packed in/out (A_d: (3,2,2,3)), H either
    shifted-view packed-in/unpacked-out (A_h: (2,2,1,3)) or plain
    (A_h: (3,1,1,3)); W unpacked."""
    Ad = jnp.asarray(A_d, w.dtype)
    Ah = jnp.asarray(A_h, w.dtype)
    k = jnp.einsum("aqrt,bpsu,tuvio->abvpqisro",
                   Ad, Ah, w)
    # shapes: (Sd, Sh, 3, Qh, Qd, Ci, 1, 2, Co)
    Sd, Sh, Sw, qh, qd, ci, rh, rd, co = k.shape
    return k.reshape(Sd, Sh, Sw, qh * qd * ci, rh * rd * co)


def conv3d_packed_down_unpack(xp, w, b=None, *, full_spatial,
                              accum_dtype=jnp.float32, precision=None):
    """Stride-2 k=3^3 TF-SAME conv3d, D-packed input -> fully UNPACKED
    output (for the 64ch -> 128ch downsample layers whose outputs stay
    native).  xp: (N, Dp, H, W, 2*Ci) -> (N, Dout, Hout, Wout, Co).

    D algebra: output o_d's window [2*o_d - lo, +2] spans input pairs
    {o_d - lo, o_d - lo + 1} — k=2 taps at stride 1 over the pair axis
    with pad (lo, 1-lo) and t = 2s + q - lo (s counted over the padded
    taps)."""
    D, H, W = full_spatial
    d_out, h_out, w_out = (-(-s // 2) for s in full_spatial)
    lo_d = tf_same_padding(D, 3, 2)[0]
    A_d = np.zeros((2, 2, 1, 3), np.float32)
    for s in range(2):
        for q in range(2):
            t = 2 * (s - lo_d) + q + lo_d
            if 0 <= t <= 2:
                A_d[s, q, 0, t] = 1.0
    A_h = np.zeros((3, 1, 1, 3), np.float32)
    for t in range(3):
        A_h[t, 0, 0, t] = 1.0
    w5 = jnp.einsum("aqrt,bpsu,tuvio->abvqpirso",
                    jnp.asarray(A_d, w.dtype), jnp.asarray(A_h, w.dtype), w)
    Sd, Sh, Sw = w5.shape[:3]
    k = w5.reshape(Sd, Sh, Sw, 2 * w.shape[3], w.shape[4])
    pads = [(lo_d, 1 - lo_d), tf_same_padding(H, 3, 2),
            tf_same_padding(W, 3, 2)]
    out = _conv(xp, k, (1, 2, 2), pads, accum_dtype, precision)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(xp.dtype)


def deconv3d_to_packed(x, w, b=None, *, out_spatial, pack_h: bool = False,
                       accum_dtype=jnp.float32, precision=None):
    """TF conv3d_transpose (k=3, s=2, SAME) from an UNPACKED input to a
    packed output (D packed; H too if ``pack_h``).

    x: (N, Di, Hi, Wi, Ci); w: (3,3,3,Co,Ci) (TF VRSCK order: C = output
    channels of the transpose).  Output: (N, ceil(Do/2), Ho(or Hp), Wo,
    G*Co) with groups (ph, pd, c).
    """
    Do, Ho, Wo = out_spatial
    lo = [tf_same_padding(X, 3, 2)[0] for X in out_spatial]
    # one k=2 conv: output channels enumerate (rh, rw?, rd...) — compute
    # all 8 parities, keep packed dims in channels, weave the rest.
    A = [_A_deconv(l) for l in lo]
    Ad, Ah, Aw = (jnp.asarray(a, w.dtype) for a in A)
    # K[a,b,e, i, rd,rh,rw, o] ; w is (td,th,tw,Co,Ci)
    k = jnp.einsum("adt,bhu,ewv,tuvoi->abeidhwo", Ad, Ah, Aw, w)
    Sd, Sh, Sw, ci = k.shape[0], k.shape[1], k.shape[2], k.shape[3]
    co = k.shape[-1]
    k = k.reshape(Sd, Sh, Sw, ci, 8 * co)  # (rd, rh, rw, co) groups
    pads = [(1 - l, l) for l in lo]
    # input taps s in {0,1} read X[o2 - 1 + lo + s]
    out = _conv(x, k, (1, 1, 1), pads, accum_dtype, precision)
    n = x.shape[0]
    d2, hh, ww = out.shape[1:4]
    out = out.reshape(n, d2, hh, ww, 2, 2, 2, co)
    # weave W parities (always unpacked)
    w_even = out[..., 0, :]
    w_odd = out[..., 1, :]
    out = _weave_axis(w_even.reshape(n, d2, hh, ww, 4 * co),
                      w_odd.reshape(n, d2, hh, ww, 4 * co), 3, Wo)
    ww = Wo
    out = out.reshape(n, d2, hh, ww, 2, 2, co)
    if pack_h:
        # keep rh as the slowest channel group: (ph, pd, c)
        out = jnp.moveaxis(out, 5, 4)  # (n,d2,hh,ww, rh, rd, co)
        out = out.reshape(n, d2, hh, ww, 4 * co)
        out = _bias(out, b, 4)
        out = _zero_pad_slots(out, out_spatial, d=True, h=True)
    else:
        h_even = out[..., 0, :].reshape(n, d2, hh, ww, 2 * co)
        h_odd = out[..., 1, :].reshape(n, d2, hh, ww, 2 * co)
        out = _weave_axis(h_even, h_odd, 2, Ho)
        out = _bias(out, b, 2)
        out = _zero_pad_slots(out, out_spatial, d=True, h=False)
    return out.astype(x.dtype)
