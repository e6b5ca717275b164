"""Fused concat-cost-volume + first conv3d.

The concat cost volume V (N, D, H, W, 2C) is *structured*
(`kernels.cu:51-97` semantics):

    V[d, h, x, 0:C]  = left[h, x]            (constant across d)
    V[d, h, x, C:2C] = right[h, x - d]       (0 where x < d)

so the network's first 3x3x3 stride-1 conv3d over V factors exactly:

- **left half**: every depth tap kd sees the same left map, so the
  interior-d output is ONE conv2d with the depth-summed kernel; the two
  boundary depths (d = 0, D-1) just drop one tap's conv2d.
- **right half**: conv2d commutes with the disparity shift up to a
  1-column boundary term — conv2d(shift(right, d'), w) equals
  shift(conv2d(right, w), d') everywhere except column x = d'-1, which
  gains w[:, 2] (the right-most kernel column) applied to right's
  column 0. Three conv2d + D shifted adds + a rank-1 correction replace
  the dense 3D convolution.

Net effect per model: the (D, H, W, 2C) volume (about 1 GB in NVSmall at
1025x321) is never materialized, and the heaviest conv3d's FLOPs drop
~16x (2 x 3 conv2d on the C-channel feature maps instead of D sweeps of a
2C-channel 3D stencil). This restructuring is exact (fp32-tested against
cost_volume + conv3d) — an optimization the reference's TRT plugin
pipeline could not express across its plugin boundary.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

from redtail_tpu.ops.convolution import _precision_for


def use_pallas_cv_emit() -> bool:
    """Gate for the Pallas packed-emission kernel
    (`kernels/fused_cv_emit_pallas.py`): replaces the XLA per-disparity
    assembly loop of `emit='dh_shifted'`. Opt-in while under evaluation
    (REDTAIL_TPU_PALLAS_CV_EMIT=1, TPU backend only — interpret-mode
    correctness is gated in tests by calling the kernel directly)."""
    import jax
    return os.environ.get("REDTAIL_TPU_PALLAS_CV_EMIT", "0") == "1" and \
        jax.default_backend() == "tpu"


def _conv2d_nhwc(x, w, accum_dtype=jnp.float32, precision=None):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype,
        precision=_precision_for(x, precision))


def cost_volume_conv3d(left, right, w, b=None, max_disp: int = 48,
                       *, precision=None, act=None, emit: str = "full"):
    """left/right (N, H, W, C) + conv3d weights w (3, 3, 3, 2C, K) ->
    conv3d(cost_volume(left, right, D), w, stride 1, SAME): (N, D, H, W, K).

    ``act``: optional activation applied per-slice inside the D loop —
    which runs in the INPUT dtype (bf16 in serving; the conv
    accumulations themselves are fp32, downcast once before the loop to
    halve its HBM traffic) — so the packed path folds the model's ELU
    here with no extra full-volume pass.  bf16 drift vs the fp32 path is
    bounded by a gate in tests/test_ops_golden.py.
    ``emit='dh_shifted'``: return the SHIFTED (ph, pd, c)-packed layout
    of `ops.packed3d` — (N, Dp+1, Hp+1, W, 4K) with slot a holding
    originals (2a-1, 2a) per packed axis and zero boundary slots — built
    from per-slice strided H slices at stack time, so the packed volume
    costs the same single write as the full one (no separate pack pass).
    This is exactly the convention `conv3d_packed` consumes (emitting
    aligned output), so the whole 3D stack runs conv-only.
    """
    n, h, wd, c = left.shape
    kd, kh, kw, c2, k_out = w.shape
    assert kd == 3 and c2 == 2 * c, (w.shape, c)
    w_l = w[:, :, :, :c, :]
    w_r = w[:, :, :, c:, :]

    # Left half: the 3 depth taps' conv2d run as ONE conv with the tap
    # kernels concatenated on output channels (3x32 = 96 lanes instead
    # of three 32-lane convs), then channel-sliced; interior d uses the
    # depth-summed kernel.
    la = _conv2d_nhwc(left, jnp.concatenate([w_l[i] for i in range(3)],
                                            axis=3), precision=precision)
    a = [la[..., i * k_out:(i + 1) * k_out] for i in range(3)]
    a_sum = a[0] + a[1] + a[2]

    # Right half: 3 depth-tap kernels + 3 boundary-correction kernels
    # (the latter are the right kernel column only, zero-padded back to
    # width 3 so all six ride one 192-lane conv).
    # Corrections: conv2d(shift(right, d')) differs from
    # shift(conv2d(right), d') in exactly two columns, both through the
    # kernel's right column (kw index 2):
    #   x = d'-1 gains  sum_kh w_r[i, kh, 2] . right[h+kh-1, 0]
    #   x = W-1  loses  sum_kh w_r[i, kh, 2] . right[h+kh-1, W-d']
    # cc[i][:, :, x] is that vertical conv at column x.
    wz_col = jnp.zeros_like(w_r[0][:, 0:1])
    cc_kernels = [jnp.concatenate([wz_col, w_r[i][:, 2:3], wz_col], axis=1)
                  for i in range(3)]
    rb = _conv2d_nhwc(right, jnp.concatenate(
        [w_r[i] for i in range(3)] + cc_kernels, axis=3),
        precision=precision)
    bk = [rb[..., i * k_out:(i + 1) * k_out] for i in range(3)]
    cc = [rb[..., (3 + i) * k_out:(4 + i) * k_out] for i in range(3)]

    # The conv accumulations above stay fp32; the D-loop below is pure
    # adds of full maps — in the model's own dtype the loop's HBM
    # traffic halves (bf16) with only add-rounding at stake.
    a = [t.astype(left.dtype) for t in a]
    a_sum = a_sum.astype(left.dtype)
    bk = [t.astype(left.dtype) for t in bk]
    cc = [t.astype(left.dtype) for t in cc]

    cols = jnp.arange(wd)
    last_col = (cols == wd - 1).astype(left.dtype)[None, None, :, None]

    def d_slices(a, a_sum, bk, cc):
        """The per-disparity accumulation (H-layout-agnostic: only W is
        indexed, so it runs identically on H-parity-split maps).

        Shift algebra (r3): shift(bk_i, d+i-1) = shift(shift(bk_i, i-1), d)
        with zero-fill, exactly, except one column — so the three per-d
        shifted adds collapse into ONE precomputed map
        S = shift(bk0, -1) + bk1 + shift(bk2, +1) plus single-column
        fixups: the composed bk0 term loses value bk0[:, :, 0] at column
        d-1 (re-added with the cc fixup already landing there), and the
        out-of-range depth taps at d = 0 / max_disp-1 subtract their
        S contribution back out.  Halves the loop's full-map HBM reads
        (a_sum + 3 shifted maps -> a_sum + S)."""
        z1 = jnp.zeros_like(bk[0][:, :, :1])
        s_map = (jnp.concatenate([bk[0][:, :, 1:], z1], axis=2) + bk[1]
                 + jnp.concatenate([z1, bk[2][:, :, :-1]], axis=2))
        bk0_col0 = bk[0][:, :, 0][:, :, None, :]

        def shift_w(m, k):
            return jnp.pad(m[:, :, : wd - k], ((0, 0), (0, 0), (k, 0),
                                               (0, 0))) if k else m

        out = []
        for d in range(max_disp):
            acc = a_sum + shift_w(s_map, d)
            if d == 0:
                # depth tap i=0 (dp=-1) out of range: remove its S part
                acc = acc - a[0] \
                    - jnp.concatenate([bk[0][:, :, 1:], z1], axis=2)
            if d == max_disp - 1:
                # depth tap i=2 (dp=max_disp) out of range
                acc = acc - a[2] - shift_w(
                    jnp.concatenate([z1, bk[2][:, :, :-1]], axis=2), d)
            col_fix = {}  # column index -> (N, H, 1, K) addend

            def add_col(idx, vec):
                col_fix[idx] = col_fix.get(idx, 0) + vec
            if d >= 1:
                add_col(d - 1, bk0_col0)  # composition fixup (tap 0)
            for i in range(3):
                dp = d + i - 1
                if 1 <= dp <= max_disp - 1 and dp < wd:
                    add_col(dp - 1, cc[i][:, :, 0][:, :, None, :])
                    add_col(wd - 1,
                            -cc[i][:, :, wd - dp][:, :, None, :])
            for idx, vec in col_fix.items():
                onehot = (cols == idx).astype(acc.dtype)
                acc = acc + vec * onehot[None, None, :, None]
            if b is not None:
                acc = acc + b.astype(acc.dtype)
            if act is not None:
                acc = act(acc)
            out.append(acc.astype(left.dtype))
        return out

    if emit == "dh_shifted":
        # Split the SIX base maps into H-parity rows once (rows 2b-1+qh,
        # Hp+1 slots, zero boundary rows), then run the disparity loop
        # per parity — ~10 strided slices total instead of 4 per volume
        # slice, and the pair assembly is pure channel concat.
        hp = (h + 1) // 2

        def h_split(m, qh):
            rows = m[:, 1::2] if qh == 0 else m[:, 0::2]
            lead = 1 if qh == 0 else 0
            need = hp + 1 - lead - rows.shape[1]
            parts = ([jnp.zeros_like(m[:, :1])] if lead else []) + [rows]
            if need > 0:
                parts.append(jnp.zeros_like(m[:, :need]))
            return jnp.concatenate(parts, axis=1)

        # bias/act run inside d_slices over ALL rows, including the zero
        # boundary rows h_split inserted — which must end exactly zero
        # (they are the packed layout's TF-SAME padding; elu(bias) there
        # corrupts every consumer's band algebra). Re-zero them with a
        # CONSTANT row-mask multiply (exact 0/1; fuses into the slice
        # epilogues where a where may not): qh=0 rows are originals
        # 2b-1 (b=0 -> -1), qh=1 rows are 2b; outside [0, H) is padding.
        import numpy as _np

        def _row_mask(qh, dtype):
            orig = 2 * _np.arange(hp + 1) - 1 + qh
            good = ((orig >= 0) & (orig <= h - 1)).astype(_np.float32)
            return jnp.asarray(good[None, :, None, None], dtype)

        from redtail_tpu.ops.activations import elu as _elu
        if use_pallas_cv_emit() and act is _elu and b is not None \
                and left.shape[0] == 1 and max_disp % 2 == 0:
            from redtail_tpu.kernels.fused_cv_emit_pallas import (
                emit_dh_shifted_pallas)

            def split(t):
                return (h_split(t, 0), h_split(t, 1))
            return emit_dh_shifted_pallas(
                [split(t) for t in a], split(a_sum),
                [split(t) for t in bk], [split(t) for t in cc],
                b, max_disp, h)

        outs = []
        for qh in (0, 1):
            sl = d_slices([h_split(t, qh) for t in a],
                          h_split(a_sum, qh),
                          [h_split(t, qh) for t in bk],
                          [h_split(t, qh) for t in cc])
            good = _row_mask(qh, sl[0].dtype)
            outs.append([s * good for s in sl])
        zslice = jnp.zeros_like(outs[0][0])

        def at(qh, d):
            return outs[qh][d] if 0 <= d < max_disp else zslice

        pairs = [jnp.concatenate(
            [at(qh, 2 * ad - 1 + qd) for qh in (0, 1) for qd in (0, 1)],
            axis=-1) for ad in range((max_disp + 1) // 2 + 1)]
        return jnp.stack(pairs, axis=1)  # (N, Dp+1, Hp+1, W, 4K)
    return jnp.stack(d_slices(a, a_sum, bk, cc), axis=1)  # (N, D, H, W, K)
