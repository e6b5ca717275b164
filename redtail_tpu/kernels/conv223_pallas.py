"""Mosaic kernel for the packed-3D stride-1 convolution.

`ops/packed3d.py:conv3d_packed` lowers the models' k=3^3 stride-1 3D
convs to ONE dense `lax.conv` with kernel (2, 2, 3, C, K) over the
(slot_d, slot_h, W) axes (band algebra in that module's docstring).  At
NVSmall's conv3D_2 shape that conv runs ~34% MFU through XLA (5.9 ms
for 392 GFLOP on a v5e) — the acknowledged remaining 3D-zoo lever was
a custom kernel (CLAUDE.md perf notes).

Kernel strategy:

- Grid over (D_out, H-blocks).  W stays whole on sublanes, C on lanes
  (the same layout rule as `cost_volume_pallas`).  The +1 halo row each
  window needs arrives as a separate 1-row BlockSpec (index units of 1
  row), so Pallas's automatic pipelining double-buffers everything — no
  manual DMA.
- Each (td, th) tap pair writes into a zero-edged (BH+1, W+2, C) VMEM
  scratch once; the 12 taps are then static sublane-offset slices fed
  to `dot_general` with a (BH, W, C) lhs — K=128 contractions
  accumulate in fp32.
- Bias is added in the fp32 accumulator INSIDE the kernel (the packed
  ops' dtype rule: bias before the output cast), then one bf16 store.
  Boundary-slot masks and the ELU stay outside: they are elementwise,
  XLA fuses them into the store's consumers, and `_mask_slot` zeroing
  commutes with the cast.

Opt-in via REDTAIL_TPU_PALLAS_CONV3D=1 (Mosaic compiles are ~10 min
per shape through the remote service; the persistent cache makes
subsequent runs free).  Exactness is gated in tests via interpret mode.

MEASURED (v5e, tools/microbench_conv223.py, NVSmall conv3D_2 shape
(1,25,82,513,128)x(2,2,3,128,128)): rel err 3.7e-3 (bf16 tap-order),
XLA 5.872 ms vs this kernel 20.465 ms — **0.29x, the XLA lowering
wins**.  XLA runs the same dense conv at ~34% MFU; this kernel's 12
sequential dot+accumulate rounds serialize the MXU against the fp32
scratch and the per-step window rebuild adds pure VPU copy traffic,
and the scoped-vmem ceiling caps BH at ~6 so each grid step's
M=BH*W stays too small to amortize.  Kept opt-in as the measured
closure of the "custom Mosaic conv3d kernel" lever (CLAUDE.md r2
notes) — together with the rejected Mosaic-resblock analysis this
closes the hand-kernel route for the dense packed convs: XLA's conv
lowering at >=128 lanes is the production path.
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


def _conv223_kernel(xm0, xm1, xh0, xh1, k_ref, b_ref, o_ref,
                    scr0, scr1, acc_ref, *, bh: int, w: int, prec):
    # Build the two depth-slots' zero-edged (BH+1, W+2, C) windows.
    for scr, xm, xh in ((scr0, xm0, xh0), (scr1, xm1, xh1)):
        scr[:, 0, :] = jnp.zeros_like(scr[:, 0, :])
        scr[:, w + 1, :] = jnp.zeros_like(scr[:, w + 1, :])
        scr[0:bh, 1:w + 1, :] = xm[0, 0]
        scr[bh, 1:w + 1, :] = xh[0, 0, 0]
    # In-place accumulation into one fp32 scratch: a 12-term jnp add
    # chain made Mosaic's stack allocator keep every tap's (BH, W, K)
    # temporary live at once (32 MB scoped-vmem OOM at NVSmall shapes).
    acc_ref[:] = jnp.broadcast_to(b_ref[0].astype(jnp.float32),
                                  acc_ref.shape)
    for td, scr in ((0, scr0), (1, scr1)):
        for th in (0, 1):
            for tw in (0, 1, 2):
                xi = scr[th:th + bh, tw:tw + w, :]
                acc_ref[:] = acc_ref[:] + lax.dot_general(
                    xi, k_ref[td, th, tw],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)
    o_ref[0, 0] = acc_ref[:].astype(o_ref.dtype)


def conv223_pallas(xp, k, b, *, bh: int = 3, interpret=None):
    """Dense stride-1 conv of `conv3d_packed`'s in_shifted form.

    xp (1, Dp, Hp, W, C) -> (1, Dp-1, Hp-1, W, K) with kernel
    k (2, 2, 3, C, K), pads ((0,0), (0,0), (1,1)); ``b`` is the
    group-tiled bias (K,), added in fp32 before the output cast
    (mirrors `_conv` + `_bias`)."""
    n, dp, hp, w, c = xp.shape
    kd, kh, kw, kc, kk = k.shape
    assert n == 1 and (kd, kh, kw) == (2, 2, 3) and kc == c, (xp.shape,
                                                             k.shape)
    d_out, h_out = dp - 1, hp - 1
    assert h_out % bh == 0, (h_out, bh)
    nhb = h_out // bh
    if interpret is None:
        interpret = _interpret()
    # Match ops/convolution.py:_precision_for — fp32 inputs need HIGHEST
    # or the MXU rounds operands to bf16 (fp32-exactness rule).
    prec = (lax.Precision.HIGHEST if xp.dtype == jnp.float32
            else lax.Precision.DEFAULT)

    grid = (d_out, nhb)
    main = pl.BlockSpec((1, 1, bh, w, c), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, 1, 1, w, c), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_conv223_kernel, bh=bh, w=w, prec=prec),
        grid=grid,
        in_specs=[
            # block-unit maps: dp blocks of 1 -> element dp; hp main
            # blocks of BH -> element h*BH; halo blocks of 1 row ->
            # element (h+1)*BH (== the window's last row, <= Hp-1).
            pl.BlockSpec((1, 1, bh, w, c),
                         lambda d, h: (0, d, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bh, w, c),
                         lambda d, h: (0, d + 1, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, c),
                         lambda d, h: (0, d, (h + 1) * bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, c),
                         lambda d, h: (0, d + 1, (h + 1) * bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),          # kernel
            pl.BlockSpec(memory_space=pltpu.VMEM),          # bias (1, K)
        ],
        out_specs=pl.BlockSpec((1, 1, bh, w, kk),
                               lambda d, h: (0, d, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, d_out, h_out, w, kk), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 1, w + 2, c), xp.dtype),
            pltpu.VMEM((bh + 1, w + 2, c), xp.dtype),
            pltpu.VMEM((bh, w, kk), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * d_out * h_out * w * 12 * c * kk,
            bytes_accessed=xp.size * xp.dtype.itemsize * 2,
            transcendentals=0),
        interpret=interpret,
    )(xp, xp, xp, xp, k, b.reshape(1, kk))
    return out
