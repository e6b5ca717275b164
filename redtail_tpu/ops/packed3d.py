"""Channel-packed 3D convolutions: fold D/H pairs into channels.

Why: the 3D stereo models (NVTiny/NVSmall/ResNet-18, SURVEY §2.3) run
their heaviest convolutions at 16-64 channels — a fraction of the MXU's
128 lanes on the full-resolution cost volume — and measure at 3-15% MFU
(NVSmall conv3D_2: 14.2 ms for 219 GFLOP ≈ 8%; the lhs-dilated
deconv3D_2 at 3%).  Folding pairs of depth (and height, where channels
allow) slices into the channel dimension runs the same convolutions at
64-128 channels — a 1.33-1.78x dense-FLOP overhead for full MXU lanes,
measured 1.7-9x faster per layer on a v5e.  TPU-only restructuring with
no reference counterpart (the TRT plugins, `stereoDNN/lib/
conv3d_plugin.cpp`, ran cuDNN at native widths).

Design rule — ONLY convolutions touch data (v3)
-----------------------------------------------
Two failed iterations taught the glue economics of this chip: shifted
input views, stack- or dilation-pad weaves, strided-slice packs, and
`.at[].set` masks all measured 10-70x off bandwidth roofline at NVSmall
shapes, eating every conv win (composed 71-147 ms vs 53 native).  v3
has NO data-movement glue at all — every op is exactly ONE
`conv_general_dilated` (+ a fused iota mask where odd sizes require it):

- **Pair conventions.** A packed axis is either *aligned*
  (slot a = originals (2a, 2a+1)) or *shifted* (slot a = (2a-1, 2a),
  one extra slot, boundary slots zero).  A stride-1 conv consuming one
  convention EMITS the other at k=2 taps per packed axis — the same
  band table t = 2s+q-r both ways, only the padding differs — so
  chains of stride-1 layers alternate conventions for free.  The
  models' graphs fit perfectly: `conv_a -> conv_b(skip)` pairs leave
  every skip tensor aligned, which the decoder needs.
- **Downsamples** consume aligned pairs with 3 taps at stride 2 along
  D (both output parities in channels) and 2 taps along packed H.
- **Transposed convs** run packed-in -> packed-out as a single
  lhs-dilated conv over the pair axis (3 taps, dilation 2), packed-H
  output as 2 taps, W upsampled natively — measured 0.83 ms at the
  deconv3D_2 shape that cost 9.5 ms natively and 18.5 ms in the
  weave-based formulation.
- **Unpack** (only before the final full-res deconv, whose c_out=1
  path has its own dfold lowering) is an identity-weight lhs-dilated
  conv (depth-to-space on the MXU), not a reshape.

Band algebra (k=3 TF-SAME; o = output original index, i = input,
q/r = input/output parity-in-channel, s = kernel tap):
  conv    : i = sigma*o - lo + t
  deconv  : o = 2*i - lo + t
with i = 2*slot + q (aligned) or 2*slot + q - 1 (shifted); solve t per
(s, q, r); entries outside t in [0, 2] are zero blocks.

All ops are exact vs their native counterparts (fp32-gated in
tests/test_packed3d.py across odd/even sizes and both lo parities,
plus full-pipeline parity for all three 3D specs).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from redtail_tpu.ops.convolution import _precision_for, tf_same_padding


# ------------------------------------------------------------ helpers


def _conv(x, k, strides, pads, dil, accum_dtype, precision):
    return lax.conv_general_dilated(
        x, k, strides, pads, lhs_dilation=dil,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=accum_dtype,
        precision=_precision_for(x, precision))


_MASK_FORM = contextvars.ContextVar("packed3d_mask_form", default="auto")


@contextlib.contextmanager
def mask_form(form: str):
    """Force the pad-slot mask lowering for ops issued in this scope:
    'where' (iota select), 'mul' (constant 0/1 broadcast multiply), or
    'auto' (each mask family's measured winner — the default).  Exposed
    per-SCOPE so sweeps can assign forms per LAYER."""
    tok = _MASK_FORM.set(form)
    try:
        yield
    finally:
        _MASK_FORM.reset(tok)


def _mask_slot(y, axis: int, slot: int, ch_pred, auto: str = "where"):
    """Zero channels satisfying ``ch_pred`` at one index of ``axis``
    (fused iota select — no scatter — or a constant 0/1 multiply).

    ``auto`` names the form this call site measured fastest; the
    `mask_form` context can force either.  Measured (r3, composed,
    NVSmall 1025x321 chained-latency): module-wide 'mul' LOSES
    (28.9 -> 30.4, the deconv emissions) even though 'mul' wins the
    isolated conv3D_2 A/B (7.02 -> 5.50 ms) — but per-call-site it
    splits: the SHIFTED-OUT masks of aligned-in stride-1 convs (the
    2-3-mask family, conv3D_4-class) win with 'mul' (28.89 -> 28.58)
    while everything else keeps 'where'.  Same story as packed2d's
    _mask_rows (multiply won the 2D encoder, flagship 379 -> 474 fps):
    fusion context decides, so each family carries its winner."""
    form = _MASK_FORM.get()
    if form == "auto":
        form = auto
    if form == "mul":
        n_ax, c = y.shape[axis], y.shape[-1]
        m = np.ones((n_ax, c), np.float32)
        m[slot, np.asarray(ch_pred(np.arange(c)))] = 0.0
        shape = [1] * y.ndim
        shape[axis], shape[-1] = n_ax, c
        return y * jnp.asarray(m.reshape(shape), y.dtype)
    idx = lax.broadcasted_iota(jnp.int32, y.shape, axis)
    cix = lax.broadcasted_iota(jnp.int32, y.shape, y.ndim - 1)
    return jnp.where((idx == slot) & ch_pred(cix), jnp.zeros((), y.dtype), y)


def _A(table, S, Q, R):
    """Band tensor A[s, q, r, t] from a callable t(s, q, r)."""
    A = np.zeros((S, Q, R, 3), np.float32)
    for s in range(S):
        for q in range(Q):
            for r in range(R):
                t = table(s, q, r)
                if 0 <= t <= 2:
                    A[s, q, r, t] = 1.0
    return A


_A_ID = _A(lambda s, q, r: s, 3, 1, 1)   # plain 3-tap axis


def _kernel(w, A_d, A_h, A_w, *, transposed=False):
    """Compose per-axis bands into one conv kernel.

    w: (3,3,3,Ci,Co) forward or (3,3,3,Co,Ci) transposed (TF VRSCK).
    Returns (Sd, Sh, Sw, Qh*Qd*Ci, Rh*Rd*Co): channel groups (ph, pd, c)
    on both sides (W never packs)."""
    Ad = jnp.asarray(A_d, w.dtype)
    Ah = jnp.asarray(A_h, w.dtype)
    Aw = jnp.asarray(A_w, w.dtype)
    wf = "tuvoi" if transposed else "tuvio"
    k = jnp.einsum(f"aqrt,bpsu,exyv,{wf}->abepqisro", Ad, Ah, Aw, w)
    Sd, Sh, Sw, qh, qd, ci, rh, rd, co = k.shape
    return k.reshape(Sd, Sh, Sw, qh * qd * ci, rh * rd * co)


def _pallas_bh(xp, k) -> Optional[int]:
    """H-block size for the Mosaic stride-1 conv path, or None.

    Opt-in (REDTAIL_TPU_PALLAS_CONV3D=1; ~10 min Mosaic compile per
    shape through the remote service, then cached).  Needs batch 1 and
    an H_out divisible by a reasonable block.  Measured 0.29x vs the
    XLA lowering at NVSmall's conv3D_2 shape — kept as the measured
    closure of the custom-kernel lever, NOT a production path (see
    kernels/conv223_pallas.py docstring)."""
    import os
    if os.environ.get("REDTAIL_TPU_PALLAS_CONV3D") != "1":
        return None
    if xp.shape[0] != 1 or k.shape[:3] != (2, 2, 3):
        return None
    h_out = xp.shape[2] - 1
    w, c = xp.shape[3], xp.shape[4]
    for bh in (6, 5, 4, 3, 2):   # largest block first (M=BH*W drives MXU)
        if h_out % bh:
            continue
        # Rough scoped-vmem bound (~32 MB): double-buffered in/out blocks
        # + the two window scratches + the fp32 accumulator.
        itemsize = xp.dtype.itemsize
        vmem = (4 * bh * w * c * itemsize * 2        # 2 in-blocks, 2x buf
                + 2 * (bh + 1) * (w + 2) * c * itemsize
                + bh * w * k.shape[-1] * (4 + 2 * itemsize))
        if vmem <= 28 * 2 ** 20:
            return bh
    return None


def _bias(out, b, groups):
    if b is None:
        return out
    return out + jnp.tile(b, (groups,)).astype(out.dtype)


# ------------------------------------------------------------ pack/unpack


def pack(x, *, d: bool = True, h: bool = False, shifted: bool = False):
    """(N, D, H, W, C) -> packed (N, Dp[+1], Hp[+1], W, G*C), groups
    (ph, pd, c).  Reference/test path (strided slices); production code
    should receive packed tensors from producers (the fused cost-volume
    op emits them) rather than calling this on hot tensors."""
    assert x.ndim == 5

    def one(x, axis):
        lead = 1 if shifted else 0
        L = x.shape[axis]
        slots = (L + 1) // 2 + lead   # shifted carries one extra slot
        lo_pad = [(0, 0)] * 5
        lo_pad[axis] = (lead, 2 * slots - L - lead)
        xx = jnp.pad(x, lo_pad)
        p0 = lax.slice_in_dim(xx, 0, xx.shape[axis], 2, axis=axis)
        p1 = lax.slice_in_dim(xx, 1, xx.shape[axis], 2, axis=axis)
        return jnp.concatenate([p0, p1], axis=-1)

    if d:
        x = one(x, 1)
    if h:
        x = one(x, 2)
    return x


def unpack_ref(x, full_spatial, *, d: bool = True, h: bool = False,
               shifted: bool = False):
    """Reference unpack (slices + interleave) — tests only."""
    dd, hh, ww = full_spatial
    lead = 1 if shifted else 0

    def one(x, axis, L):
        c2 = x.shape[-1] // 2
        p0, p1 = x[..., :c2], x[..., c2:]
        parts = jnp.stack([p0, p1], axis=axis + 1)
        shape = list(parts.shape)
        shape[axis:axis + 2] = [shape[axis] * 2]
        out = parts.reshape(shape)
        return lax.slice_in_dim(out, lead, lead + L, axis=axis)

    if h:
        x = one(x, 2, hh)
    if d:
        x = one(x, 1, dd)
    return x


def unpack_h_conv(xp, full_spatial, *, accum_dtype=jnp.float32,
                  precision=None):
    """Unpack ONLY the H axis of a DH-packed tensor (identity-weight
    lhs-dilated conv): (N, Dp, Hp, W, 4C) -> (N, Dp, H, W, 2C) with
    (pd, c) channels kept packed.  Used before the final dfold deconv,
    whose internal D-to-channels transpose consumes the D-packed form
    directly (d = 2*d2 + pd is exactly its d-major channel order)."""
    D, H, W = full_spatial
    C4 = xp.shape[-1]
    C = C4 // 4
    kd = np.zeros((1, 2, 1, C4, 2 * C), np.float32)
    for ph in range(2):
        for pd in range(2):
            for c in range(C):
                kd[0, 1 - ph, 0, (ph * 2 + pd) * C + c, pd * C + c] = 1.0
    k = jnp.asarray(kd, xp.dtype)
    out = _conv(xp, k, (1, 1, 1), [(0, 0), (1, 1), (0, 0)],
                (1, 2, 1), accum_dtype, precision)
    return out[:, :, :H].astype(xp.dtype)


def unpack_conv(xp, full_spatial, *, packed_h: bool = False,
                accum_dtype=jnp.float32, precision=None):
    """Depth-to-space as an identity-weight lhs-dilated conv (the only
    fast layout conversion on this chip — measured 2.9 ms vs 7-69 ms
    for reshape/dilation-pad forms at NVSmall full-res shapes).

    xp: aligned packed (N, Dp, Hp?, W, G*C) -> (N, D, H, W, C)."""
    D, H, W = full_spatial
    G = 4 if packed_h else 2
    C = xp.shape[-1] // G
    # kernel (2, 2|1, 1): output original parity (pd, ph) reads channel
    # group (ph, pd, c) from the matching dilated slot.
    kd = np.zeros((2, 2 if packed_h else 1, 1, G * C, C), np.float32)
    for ph in range(2 if packed_h else 1):
        for pd in range(2):
            for c in range(C):
                g = (ph * 2 + pd) * C if packed_h else pd * C
                # dilated-grid tap: s=1 hits even outputs (q=0),
                # s=0 hits odd outputs (q=1) — per axis.
                sd = 1 - pd
                sh = (1 - ph) if packed_h else 0
                kd[sd, sh, 0, g + c, c] = 1.0
    k = jnp.asarray(kd, xp.dtype)
    dil = (2, 2 if packed_h else 1, 1)
    pad_h = (1, 1) if packed_h else (0, 0)
    out = _conv(xp, k, (1, 1, 1), [(1, 1), pad_h, (0, 0)], dil,
                accum_dtype, precision)
    out = out[:, :D, :H]
    return out.astype(xp.dtype)


# ------------------------------------------------------------- packed ops


def conv3d_packed(xp, w, b=None, *, full_spatial, packed_h: bool = True,
                  in_shifted: bool = True, accum_dtype=jnp.float32,
                  precision=None):
    """Stride-1 k=3^3 TF-SAME conv3d on packed tensors, flipping the
    pair convention: shifted-in -> aligned-out, aligned-in -> shifted-out
    (k=2 taps per packed axis either way; band t = 2s+q-r).

    Shifted tensors carry one extra slot per packed axis with zeroed
    boundary slots (maintained here via fused masks)."""
    D, H, W = full_spatial
    A2 = _A(lambda s, q, r: 2 * s + q - r, 2, 2, 2)
    A_h = A2 if packed_h else _A_ID
    k = _kernel(w, A2, A_h, _A_ID)
    if in_shifted:
        pad_d = pad_h = (0, 0)                      # -> aligned out
    else:
        pad_d = pad_h = (1, 1)                      # -> shifted out
    if not packed_h:
        pad_h = (1, 1)
    groups = 4 if packed_h else 2
    bh = _pallas_bh(xp, k) if in_shifted and packed_h else None
    if bh is not None:
        # Mosaic fast path (opt-in REDTAIL_TPU_PALLAS_CONV3D=1): same
        # dense (2,2,3) conv, fp32 accumulation, bias fused pre-cast.
        from redtail_tpu.kernels.conv223_pallas import conv223_pallas
        bt = (jnp.tile(b, (groups,)) if b is not None
              else jnp.zeros((k.shape[-1],), xp.dtype))
        out = conv223_pallas(xp, k.astype(xp.dtype), bt, bh=bh)
    else:
        out = _conv(xp, k, (1, 1, 1), [pad_d, pad_h, (1, 1)], (1, 1, 1),
                    accum_dtype, precision)
        out = _bias(out, b, groups)
    co = out.shape[-1] // groups
    if in_shifted:
        # aligned out: zero the odd-size pad slots
        if D % 2:
            out = _mask_slot(out, 1, out.shape[1] - 1,
                             lambda c: (c // co) % 2 == 1)
        if packed_h and H % 2:
            out = _mask_slot(out, 2, out.shape[2] - 1,
                             lambda c: c >= out.shape[-1] // 2)
    else:
        # shifted out: slot 0 r=0 is Y[-1]; the last slot holds
        # (Y[2Lp-1], Y[2Lp]) — Y[2Lp] always invalid, Y[2Lp-1] too
        # when the size is odd (it equals Y[size]).  This mask family
        # measured fastest as constant multiplies (see _mask_slot).
        out = _mask_slot(out, 1, 0, lambda c: (c // co) % 2 == 0,
                         auto="mul")
        out = _mask_slot(out, 1, out.shape[1] - 1,
                         (lambda c: c == c) if D % 2 else
                         (lambda c: (c // co) % 2 == 1), auto="mul")
        if packed_h:
            half = out.shape[-1] // 2
            out = _mask_slot(out, 2, 0, lambda c: c < half, auto="mul")
            out = _mask_slot(out, 2, out.shape[2] - 1,
                             (lambda c: c == c) if H % 2 else
                             (lambda c: c >= half), auto="mul")
    return out.astype(xp.dtype)


def conv3d_packed_down(xp, w, b=None, *, full_spatial, packed_h: bool = True,
                       accum_dtype=jnp.float32, precision=None):
    """Stride-2 k=3^3 TF-SAME conv3d, ALIGNED packed input -> aligned
    D-packed output (H/W outputs unpacked).  One conv: 3 D-taps at
    stride 2 with both output parities in channels; packed-H inputs use
    the 2-tap pair form.

    full_spatial: the ORIGINAL (D, H, W) of the unpacked input."""
    D, H, W = full_spatial
    d_out, h_out = -(-D // 2), -(-H // 2)
    lo_d = tf_same_padding(D, 3, 2)[0]
    lo_h, hi_h = tf_same_padding(H, 3, 2)
    lo_w, hi_w = tf_same_padding(W, 3, 2)
    Dp = xp.shape[1]
    d_out2 = -(-d_out // 2)
    lead = lo_d
    A_d = _A(lambda s, q, r: 2 * (s - lead) + q - 2 * r + lo_d, 3, 2, 2)
    if packed_h:
        A_h = _A(lambda s, q, r: 2 * s + q - lo_h, 2, 2, 1)
        pad_h, stride_h = (lo_h, 1 - lo_h), 1
    else:
        A_h, pad_h, stride_h = _A_ID, (lo_h, hi_h), 2
    k = _kernel(w, A_d, A_h, _A_ID)
    # last D tap index = 2*(d_out2-1) + 2 -> padded length 2*d_out2 + 1
    pad_d = (lead, 2 * d_out2 + 1 - Dp - lead)
    out = _conv(xp, k, (2, stride_h, 2), [pad_d, pad_h, (lo_w, hi_w)],
                (1, 1, 1), accum_dtype, precision)
    out = _bias(out, b, 2)
    if d_out % 2:
        co = out.shape[-1] // 2
        out = _mask_slot(out, 1, out.shape[1] - 1, lambda c: c >= co)
    return out.astype(xp.dtype)


def conv3d_packed_down_unpack(xp, w, b=None, *, full_spatial,
                              accum_dtype=jnp.float32, precision=None):
    """Stride-2 k=3^3 TF-SAME conv3d, aligned D-packed input -> fully
    UNPACKED output (64ch -> 128ch downsamples).  2 D-taps over pairs at
    stride 1; H/W native stride 2."""
    D, H, W = full_spatial
    lo_d = tf_same_padding(D, 3, 2)[0]
    A_d = _A(lambda s, q, r: 2 * s + q - lo_d, 2, 2, 1)
    k = _kernel(w, A_d, _A_ID, _A_ID)
    out = _conv(xp, k, (1, 2, 2),
                [(lo_d, 1 - lo_d), tf_same_padding(H, 3, 2),
                 tf_same_padding(W, 3, 2)], (1, 1, 1),
                accum_dtype, precision)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(xp.dtype)


def deconv3d_packed(x, w, b=None, *, out_spatial, in_packed_d: bool,
                    pack_h: bool = False, accum_dtype=jnp.float32,
                    precision=None):
    """TF conv3d_transpose (k=3, s=2, SAME) emitting an ALIGNED packed
    output (D packed; H too if ``pack_h``) as ONE lhs-dilated conv — no
    weaves, no unpacking.

    Input: unpacked (N, Di, Hi, Wi, Ci), or aligned D-packed
    (N, Di2, Hi, Wi, 2*Ci) with ``in_packed_d``.  w: (3,3,3,Co,Ci).

    Axis mechanics (o = 2i - lo + t):
    - D, packed-in: 3 taps over the pair axis at lhs-dilation 2,
      pad (2-lo, .): t = r - 2s - 2q + 4 - lo.
    - D, unpacked-in: 2 taps, pad (1-lo, lo): t = r + 2 - 2s - lo.
    - H -> packed out (slot count unchanged): 2 taps, pad (1-lo, lo),
      same band as D-unpacked.
    - H/W -> unpacked out: native transposed lowering (3 taps, input
      dilation 2, pad (2-lo, .), t = 2 - s) — fine at these channel
      widths (the tiny-c_out collapse dfold exists for does not apply).
    """
    Do, Ho, Wo = out_spatial
    lo_d, lo_h, lo_w = [tf_same_padding(X, 3, 2)[0] for X in out_spatial]
    di, hi, wi = x.shape[1], x.shape[2], x.shape[3]
    do2 = -(-Do // 2)

    if in_packed_d:
        A_d = _A(lambda s, q, r: r - 2 * s - 2 * q + 4 - lo_d, 3, 2, 2)
        dil_d = 2
        pad_d = (2 - lo_d, do2 + lo_d + 1 - 2 * di)
    else:
        A_d = _A(lambda s, q, r: r + 2 - 2 * s - lo_d, 2, 1, 2)
        dil_d = 1
        pad_d = (1 - lo_d, lo_d)        # out slots = di
    if pack_h:
        A_h = _A(lambda s, q, r: r + 2 - 2 * s - lo_h, 2, 1, 2)
        dil_h = 1
        pad_h = (1 - lo_h, lo_h)
    else:
        A_h = _A(lambda s, q, r: 2 - s, 3, 1, 1)
        dil_h = 2
        pad_h = (2 - lo_h, Ho + lo_h - 2 * (hi - 1) - 1)
    A_w = _A(lambda s, q, r: 2 - s, 3, 1, 1)
    pad_w = (2 - lo_w, Wo + lo_w - 2 * (wi - 1) - 1)

    k = _kernel(w, A_d, A_h, A_w, transposed=True)
    # Bias (and the odd-size masks) stay in the fp32 accumulator,
    # matching conv3d_packed/_down; single downcast at the end.
    out = _conv(x, k, (1, 1, 1), [pad_d, pad_h, pad_w],
                (dil_d, dil_h, 2), accum_dtype, precision)
    groups = 4 if pack_h else 2
    out = _bias(out, b, groups)
    co = out.shape[-1] // groups
    if Do % 2:
        out = _mask_slot(out, 1, out.shape[1] - 1,
                         lambda c: (c // co) % 2 == 1)
    if pack_h and Ho % 2:
        out = _mask_slot(out, 2, out.shape[2] - 1,
                         lambda c: c >= out.shape[-1] // 2)
    return out.astype(x.dtype)
