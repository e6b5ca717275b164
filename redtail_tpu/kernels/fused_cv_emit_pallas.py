"""Pallas kernel for the fused cost-volume+conv3D_1 PACKED EMISSION.

The XLA `emit='dh_shifted'` path of `ops.fused_cost_volume_conv` is the
NVSmall/ResNet-18 profile's third-heaviest layer (4.8 ms, 1.7% MFU,
`docs/nvsmall_profile_r5.md`): after the two feature convs, ALL of its
time is the per-disparity assembly — 2(parity) x D full-map adds of
`a_sum + shift_w(s_map, d)` + column fixups + bias + ELU + row masks,
each materializing one (Hq, W, K) slice of the packed volume. Pure
bandwidth + VPU work with zero MXU content, i.e. exactly the op class
where a hand kernel CAN beat XLA (unlike the rejected conv223, whose
sequential dot+accumulate rounds serialized the MXU).

Kernel strategy:

- Grid (ad, h_tile): one step emits one (Hb, W, 4K) tile of packed
  depth-slot `ad` — all four (parity qh, sub-depth qd) channel groups
  (disparities d = 2*ad - 1 + qd) computed in-register and stored as
  ONE full-lane write (a 32-lane output block is illegal: the last two
  block dims must be 8/128-divisible or full).
- W = 513 stays FULL inside the block so the disparity shift is one
  in-register **sublane roll** (`pltpu.roll` axis=-2 on an 8-padded W;
  lane rolls are the ~14 us catastrophe class, CLAUDE.md Mosaic facts).
- The d = 0 / d = D-1 boundary-tap corrections are folded into the
  INPUT selection instead of in-kernel tensor branches: base/smap are
  passed variant-stacked ((a_sum - a0, a_sum, a_sum - a2) and
  (s_map - S0, s_map, s_map - S2)) and the BlockSpec index map picks
  the variant from `ad` — shift_w is linear, so
  `a_sum + shift(s_map, d) - a2 - shift(S2, d)
   = (a_sum - a2) + shift(s_map - S2, d)` exactly. This needs each
  ad's in-range d to map to ONE variant, true exactly when max_disp is
  even (d=0 pairs with the out-of-range d=-1, d=D-1 with d=D) — the
  caller gate enforces it (all zoo models: 48/68/24).
- The per-d single-column fixups (conv-vs-shift boundary terms through
  the kernel's right column, cc taps + the bk0 composition column) are
  precomputed OUTSIDE as tiny per-(d, h_tile) vectors — in-kernel they
  are three iota-masked broadcast adds at columns d-2+j plus one at
  W-1. They carry an explicit h_tile axis so their trailing block dims
  EQUAL the array dims (the only legal non-aligned block shape).
- Row masking (the packed layout's zero TF-SAME boundary rows) is
  computed from the grid indices + an H-iota — applied AFTER bias+ELU
  (the r2 bias/pad-slot lesson), no mask input needed.
- fp32 accumulation in-register (the roll also requires 32-bit), bf16
  in/out: the kernel READS each map in bf16 (same bytes as the XLA
  path's downcast loop) and rounds once at the write.

Reference semantics: `kernels.cu:51-97` (cost volume) composed with the
first conv3d, factored per `ops/fused_cost_volume_conv.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _emit_kernel(base_ref, smap_ref, fixv_ref, fixl_ref, bias_ref, o_ref,
                 *, dmax: int, w: int, h_full: int, hb: int):
    ad = pl.program_id(0)
    ht = pl.program_id(1)
    bias = bias_ref[0].astype(jnp.float32)[None, None, :]
    wid = lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
    gid = ht * hb + lax.broadcasted_iota(jnp.int32, (hb, 1, 1), 0)

    groups = []
    for qh in (0, 1):
        base = base_ref[qh, 0].astype(jnp.float32)       # (Hb, W, K)
        smap = smap_ref[qh, 0].astype(jnp.float32)       # (Hb, Wp, K)
        good_row = (2 * gid - 1 + qh >= 0) & (2 * gid - 1 + qh <= h_full - 1)
        for qd in (0, 1):
            d = 2 * ad - 1 + qd
            # shift_w(s_map, d): sublane roll + zero-fill of the
            # wrapped cols. Wrapped-in columns land at col < d and are
            # masked, so the 8-align W pad never reaches the output.
            rolled = pltpu.roll(smap, shift=jnp.maximum(d, 0),
                                axis=1)[:, :w, :]
            acc = base + jnp.where(wid >= d, rolled, 0.0)
            fixv = fixv_ref[qh, 0, qd, 0].astype(jnp.float32)  # (3, Hb, K)
            for j in range(3):                           # cols d-2+j
                acc = acc + jnp.where(wid == d - 2 + j,
                                      fixv[j][:, None, :], 0.0)
            fixl = fixl_ref[qh, 0, qd, 0].astype(jnp.float32)  # (Hb, K)
            acc = acc + jnp.where(wid == w - 1, fixl[:, None, :], 0.0)
            acc = acc + bias
            # ELU; exp-1 rather than expm1 (unimplemented in the Mosaic
            # TC lowering), fp32 — drift gated in tests
            acc = jnp.where(acc > 0, acc, jnp.exp(acc) - 1.0)
            # Packed-layout boundary rows (original row 2g-1+qh outside
            # [0, H)) and out-of-range depth slots must end EXACTLY
            # zero — after bias+activation.
            keep = good_row & (d >= 0) & (d < dmax)
            groups.append(jnp.where(keep, acc, 0.0).astype(o_ref.dtype))
    o_ref[0, 0] = jnp.concatenate(groups, axis=-1)       # (Hb, W, 4K)


def emit_dh_shifted_pallas(a, a_sum, bk, cc, bias, max_disp: int,
                           h_full: int):
    """Assemble the (N, Dp+1, Hq, W, 4K) dh-shifted packed volume (ELU
    fused) from the H-PARITY-SPLIT fused-CV maps.

    ``a``/``bk``/``cc``: 3-lists of per-parity pairs [(qh0, qh1), ...]
    of (N, Hq, W, K) maps; ``a_sum``: (qh0, qh1) pair. Maps arrive in
    the serving dtype (bf16 or fp32); the kernel reads them as-is and
    accumulates fp32.
    """
    n, hq, w, k = a_sum[0].shape
    assert n == 1, "packed emission is batch-1 (serving path)"
    assert max_disp >= 3 and max_disp % 2 == 0, max_disp
    dtype = a_sum[0].dtype
    dp1 = (max_disp + 1) // 2 + 1                        # == dmax//2 + 1
    # H tiling: H is an unconstrained (third-minor) block dim for the
    # big maps, but the fixup vectors' trailing block dims must EQUAL
    # their array dims — so the tile size is baked into their layout.
    hb = hq // 2 if hq % 2 == 0 and hq * w * 4 * k > 2 ** 22 else hq
    n_h = hq // hb

    def z1(m):
        return jnp.zeros_like(m[:, :, :1])

    bases, smaps, fixvs, fixls = [], [], [], []
    for qh in (0, 1):
        s0 = jnp.concatenate([bk[0][qh][:, :, 1:], z1(bk[0][qh])], axis=2)
        s2 = jnp.concatenate([z1(bk[2][qh]), bk[2][qh][:, :, :-1]], axis=2)
        s_map = s0 + bk[1][qh] + s2
        bases.append(jnp.stack(
            [a_sum[qh] - a[0][qh], a_sum[qh], a_sum[qh] - a[2][qh]]))
        smaps.append(jnp.stack([s_map - s0, s_map, s_map - s2]))
        fv = jnp.zeros((dp1, 2, 3, hq, k), jnp.float32)
        fl = jnp.zeros((dp1, 2, hq, k), jnp.float32)
        for d in range(max_disp):
            ad, qd = (d + 1) // 2, (d + 1) % 2
            for i in range(3):                    # tap i -> column d-2+i
                dp = d + i - 1
                if 1 <= dp <= max_disp - 1 and dp < w:
                    fv = fv.at[ad, qd, i].add(
                        cc[i][qh][0, :, 0].astype(jnp.float32))
                    fl = fl.at[ad, qd].add(
                        -cc[i][qh][0, :, w - dp].astype(jnp.float32))
            if d >= 1:                            # bk0 composition column
                fv = fv.at[ad, qd, 1].add(
                    bk[0][qh][0, :, 0].astype(jnp.float32))
        fixvs.append(fv)
        fixls.append(fl)

    base = jnp.stack(bases)[:, :, 0]              # (2, 3, Hq, W, K)
    smap = jnp.stack(smaps)[:, :, 0]
    wp = w + ((-w) % 8)                           # Mosaic sublane-roll align
    if wp != w:
        smap = jnp.pad(smap, ((0, 0),) * 3 + ((0, wp - w), (0, 0)))
    # (2, Dp+1, 2, n_h, 3, Hb, K) / (2, Dp+1, 2, n_h, Hb, K)
    fixv = jnp.stack(fixvs).reshape(2, dp1, 2, 3, n_h, hb, k) \
        .transpose(0, 1, 2, 4, 3, 5, 6)
    fixl = jnp.stack(fixls).reshape(2, dp1, 2, n_h, hb, k)
    bias = jnp.asarray(bias, jnp.float32).reshape(1, k)

    def variant(ad):
        return jnp.where(ad == 0, 0,
                         jnp.where(ad == max_disp // 2, 2, 1))

    kernel = functools.partial(_emit_kernel, dmax=max_disp, w=w,
                               h_full=h_full, hb=hb)
    out = pl.pallas_call(
        kernel,
        grid=(dp1, n_h),
        in_specs=[
            pl.BlockSpec((2, 1, hb, w, k),
                         lambda ad, ht: (0, variant(ad), ht, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, hb, wp, k),
                         lambda ad, ht: (0, variant(ad), ht, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, 2, 1, 3, hb, k),
                         lambda ad, ht: (0, ad, 0, ht, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, 2, 1, hb, k),
                         lambda ad, ht: (0, ad, 0, ht, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda ad, ht: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, hb, w, 4 * k),
            lambda ad, ht: (0, ad, ht, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, dp1, hq, w, 4 * k), dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * dp1 * 4 * hq * w * k,
            bytes_accessed=(2 * 3 * hq * w * k * 2          # base+smap
                            + dp1 * 4 * hq * w * k
                            * jnp.dtype(dtype).itemsize),
            transcendentals=dp1 * 4 * hq * w * k),
        interpret=_interpret(),
    )(base, smap, fixv, fixl, bias)
    return out
