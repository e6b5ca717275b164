"""H-packed 2D convolutions: fold row pairs into channels (flagship).

Why: the ResNet18-2D encoder's resblocks run at 64 channels even after
the block-diagonal tower fusion — half the MXU's 128 lanes — and
dominate the flagship (~80% of e2e at 1025x321). Folding H row pairs
into channels runs them at 128 lanes: measured 2.56x on a 4-resblock
chain (1.206 -> 0.471 ms, tools/microbench_enc2d.py) for a 4/3x dense-
FLOP overhead (kh 3 -> 2 taps x 2 parities).

This is the 1-axis specialization of `ops.packed3d`'s conv-only band
algebra (same rule: every op is exactly ONE conv + fused iota masks):

- **aligned** layout: slot b, parity q holds row 2b + q (hp slots);
  **shifted**: slot a, parity r holds row 2a - 1 + r (hp + 1 slots,
  out-of-image rows zeroed). Stride-1 k=3 TF-SAME convs consume one
  convention and EMIT the other at kh=2 slot taps with the shared band
  t = 2*ws + q_in - r_out (only the padding differs) — resblock chains
  alternate for free and their skip adds always line up aligned.
- **conv1 emits packed for free**: the s2d 3x3 stem becomes a kh=4
  stride-(2,1) conv whose output channels carry the row parity
  (t = kr - q'), so the H-pack costs nothing at ingest.
- **towers_out** runs aligned -> aligned at kh=3 slot taps
  (t = 2*ws + r_out - q_in - 1) so the unpack stays the aligned form.
- **unpack** is an identity-weight lhs-dilated conv (row-pairs-to-space
  on the MXU), mirroring `packed3d.unpack_conv`.

The bias/mask rule from round 2 applies: zero boundary slots are
re-zeroed AFTER bias + activation (elu(bias) in a pad row corrupts the
band algebra of every consumer); parity tests randomize biases.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from redtail_tpu.ops.convolution import _precision_for


def _conv(x, k, strides, pads, dil, accum_dtype, precision):
    return lax.conv_general_dilated(
        x, k, strides, pads, lhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype,
        precision=_precision_for(x, precision))


def _band(table, n_ws):
    """A[ws, q, r, t] from a callable t(ws, q, r); out-of-range taps 0."""
    A = np.zeros((n_ws, 2, 2, 3), np.float32)
    for ws in range(n_ws):
        for q in range(2):
            for r in range(2):
                t = table(ws, q, r)
                if 0 <= t <= 2:
                    A[ws, q, r, t] = 1.0
    return A


def _k_packed(w, A):
    """(3, 3, Ci, Co) + band A -> (Ws, 3, 2*Ci, 2*Co), channel groups
    (parity, c) on both sides."""
    k = jnp.einsum("wqrt,txio->wxqior", jnp.asarray(A, w.dtype), w)
    Ws, kx, q2, ci, co, r2 = k.shape
    k = jnp.transpose(k, (0, 1, 2, 3, 5, 4))  # (ws, x, q, ci, r, co)
    return k.reshape(Ws, kx, 2 * ci, 2 * co)


def _mask_rows(y, h, *, shifted):
    """Zero channels whose original row index falls outside [0, h),
    applied AFTER bias + activation — as a CONSTANT broadcast multiply
    (an iota-where measured +0.84 ms unfused at NVSmall shapes; the
    multiply fuses into the conv epilogue, see packed3d._mask_slot)."""
    hp = y.shape[1]
    c = y.shape[-1]
    rows = 2 * np.arange(hp)[:, None] + (np.arange(c)[None, :] //
                                         (c // 2)) - (1 if shifted else 0)
    m = ((rows >= 0) & (rows < h)).astype(np.float32)
    return y * jnp.asarray(m[None, :, None, :], y.dtype)


def _bias(out, b):
    if b is None:
        return out
    return out + jnp.tile(b, (2,)).astype(out.dtype)


def conv1_s2d_hpacked(x_s2d, k3, b=None, *, h_half: int, act=None,
                      accum_dtype=jnp.float32, precision=None):
    """The s2d 3x3 stem emitting H-packed ALIGNED output directly.

    x_s2d: (N, H', W', 4*Craw) ingest-packed frames (H' = ceil(H/2));
    k3: the `conv5s2_kernel_to_s2d` kernel (3, 3, 4*Craw, Co) — pass it
    block-diagonalized for the fused towers. Output slot b, parity q' =
    conv1 output row 2b + q', which reads s2d rows 2b + q' - 1 + t —
    one kh=4 stride-2 conv with K[kr, :, :, (q', co)] = k3[kr - q'].
    """
    co = k3.shape[3]
    z = jnp.zeros_like(k3[0])
    taps = []
    for kr in range(4):
        for q in (0, 1):
            t = kr - q
            taps.append(k3[t] if 0 <= t <= 2 else z)
    k4 = jnp.stack(taps).reshape(4, 2, *k3.shape[1:])   # (kr, q, x, ci, co)
    k4 = jnp.transpose(k4, (0, 2, 3, 1, 4)).reshape(
        4, k3.shape[1], k3.shape[2], 2 * co)
    out = _conv(x_s2d, k4, (2, 1), [(1, 2), (1, 1)], (1, 1),
                accum_dtype, precision)
    out = _bias(out, b)
    if act is not None:
        out = act(out)
    return _mask_rows(out.astype(x_s2d.dtype), h_half, shifted=False)


_A_FLIP = _band(lambda ws, q, r: 2 * ws + q - r, 2)       # aligned<->shifted
_A_KEEP = _band(lambda ws, q, r: 2 * ws + q - r - 1, 3)   # aligned->aligned


def conv2d_hpacked(x, w, b=None, *, h: int, in_shifted: bool, act=None,
                   accum_dtype=jnp.float32, precision=None):
    """Stride-1 3x3 TF-SAME conv on H-packed input, flipping the pair
    convention (aligned-in -> shifted-out and vice versa; kh=2 taps,
    shared band t = 2*ws + q_in - r_out, only the padding differs)."""
    k = _k_packed(w, _A_FLIP)
    pad_h = (0, 0) if in_shifted else (1, 1)
    out = _conv(x, k, (1, 1), [pad_h, (1, 1)], (1, 1),
                accum_dtype, precision)
    out = _bias(out, b)
    if act is not None:
        out = act(out)
    return _mask_rows(out.astype(x.dtype), h, shifted=not in_shifted)


def conv2d_hpacked_keep(x, w, b=None, *, h: int, act=None,
                        accum_dtype=jnp.float32, precision=None):
    """Stride-1 3x3 TF-SAME conv, aligned-in -> ALIGNED-out (kh=3 slot
    taps; 2x dense FLOPs instead of 4/3x — used only where the layout
    must not flip, e.g. the final tower conv before the unpack)."""
    k = _k_packed(w, _A_KEEP)
    out = _conv(x, k, (1, 1), [(1, 1), (1, 1)], (1, 1),
                accum_dtype, precision)
    out = _bias(out, b)
    if act is not None:
        out = act(out)
    return _mask_rows(out.astype(x.dtype), h, shifted=False)


def corr_cost_volume_hpacked(left_p, right_p, max_disp: int):
    """Correlation volume on H-packed ALIGNED features, disparity-last:
    (N, hp, W, (q, C)) x2 -> (N, hp, W, (q, D)) in fp32.

    Rows are independent in a correlation (pure per-pixel channel dot),
    so the packed form is the same per-disparity W-slice arithmetic with
    the channel sum taken per parity group — the features never need
    unpacking and soft-argmax stays a lane reduction per group."""
    n, hp, w, c2 = left_p.shape
    c = c2 // 2
    lf = left_p.astype(jnp.float32).reshape(n, hp, w, 2, c)
    rf = right_p.astype(jnp.float32).reshape(n, hp, w, 2, c)
    slices = []
    for d in range(max_disp):
        prod = lf[:, :, d:] * rf[:, :, : w - d]
        s = jnp.sum(prod, axis=-1)              # (N, hp, w-d, 2)
        if d:
            s = jnp.pad(s, ((0, 0), (0, 0), (d, 0), (0, 0)))
        slices.append(s)
    vol = jnp.stack(slices, axis=-1)            # (N, hp, W, 2, D)
    return vol.reshape(n, hp, w, 2 * max_disp)


def softargmax_hpacked(vol_p, h: int, *, scale: float = 1.0):
    """Per-parity-group soft-argmax over D on an H-packed (q, D) volume
    -> (N, hp, W, 2) packed expectation, with the layout's zero pad
    rows re-zeroed (soft-argmax of an all-zero row is the MEAN index,
    not zero — the r2 boundary lesson in new clothing)."""
    from redtail_tpu.ops.softargmax import softargmax
    n, hp, w, c2 = vol_p.shape
    d2 = c2 // 2
    out = softargmax(vol_p.reshape(n, hp, w, 2, d2), axis=-1) * scale
    return _mask_rows(out, h, shifted=False)


def unpack_h2d(xp, h: int, *, accum_dtype=jnp.float32, precision=None):
    """Aligned H-packed (N, hp, W, 2C) -> (N, h, W, C): identity-weight
    lhs-dilated conv (row-pairs-to-space on the MXU)."""
    C = xp.shape[-1] // 2
    kd = np.zeros((2, 1, 2 * C, C), np.float32)
    for q in range(2):
        for c in range(C):
            kd[1 - q, 0, q * C + c, c] = 1.0
    out = _conv(xp, jnp.asarray(kd, xp.dtype), (1, 1),
                [(1, 1), (0, 0)], (2, 1), accum_dtype, precision)
    return out[:, :h].astype(xp.dtype)
