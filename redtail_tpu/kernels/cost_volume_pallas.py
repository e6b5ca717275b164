"""VMEM-blocked cost-volume kernels.

Correlation variant (`corrCostVolumeKernel`, `stereoDNN/lib/
kernels.cu:169-200`): out[y, x, d] = sum_c L[y, x, c] * R[y, x-d, c],
zero where x < d.

Kernel strategy (learned the hard way on a v5e):

- Consume the NHWC feature maps **directly** — each grid step owns one
  image row's (W, C) tiles of both maps in VMEM, so W sits on sublanes
  and C on lanes. The disparity shift is then a **sublane** roll, which
  Mosaic lowers cheaply; a first NCHW design used lane rolls
  (`tpu.dynamic_rotate` on the 128-lane axis) at ~14 us per roll — a
  thousand of them cost more than the rest of the network combined.
- Emit the volume as (N, H, D, W): no transposes enter or leave the
  kernel (dynamic per-d writes go through the scratch's leading dim) and
  the consumer soft-argmaxes over axis 2.
- fp32 in-kernel (Mosaic rotates are 32-bit only; also matches the
  reference FP16 path's fp32 accumulation, `kernels.cu:203-250`).

The op carries a `jax.custom_vjp`: backward uses the XLA gather
formulation (training-only path).
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


# --------------------------------------------------------- correlation


def _corr_kernel(l_ref, r_ref, o_ref, prod_ref, *, max_disp: int, w: int):
    # fori_loop (not a Python unroll): a 48-way unrolled body made the
    # Mosaic compile pathologically slow. Per-disparity products land in a
    # (D, W, C) scratch via its *leading* dim (dynamic indices on the last
    # two dims need static alignment proofs Mosaic can't make), then one
    # vectorized lane-reduction + mask emits the whole (D, W) tile.
    l = l_ref[0, 0].astype(jnp.float32)  # (W, C): W sublanes, C lanes
    r = r_ref[0, 0].astype(jnp.float32)

    def body(d, _):
        rd = pltpu.roll(r, shift=d, axis=0)  # sublane roll
        prod_ref[d] = l * rd
        return 0

    lax.fori_loop(0, max_disp, body, 0)
    s = jnp.sum(prod_ref[:], axis=-1)  # (D, W)
    x_ids = lax.broadcasted_iota(jnp.int32, (max_disp, w), 1)
    d_ids = lax.broadcasted_iota(jnp.int32, (max_disp, w), 0)
    o_ref[0, 0] = jnp.where(x_ids >= d_ids, s, 0.0).astype(o_ref.dtype)


def _pad_axis(x, axis: int, multiple: int = 8):
    rem = (-x.shape[axis]) % multiple
    if rem:
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, rem)
        x = jnp.pad(x, pads)
    return x


def _corr_pallas_nhwc(left, right, max_disp: int):
    """(N, H, W, C) x2 -> (N, H, D, W)."""
    n, h, w, c = left.shape
    # The Mosaic sublane rotate requires an 8-aligned sublane dim; pad W
    # (rolled axis) with zeros and slice the output back. Wrapped-in
    # padding only lands at x < d, which the mask zeroes anyway.
    left = _pad_axis(left, 2)
    right = _pad_axis(right, 2)
    wp = left.shape[2]
    kernel = functools.partial(_corr_kernel, max_disp=max_disp, w=wp)
    feat_spec = pl.BlockSpec((1, 1, wp, c), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, max_disp, wp), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n, h),
        in_specs=[feat_spec, feat_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, max_disp, wp), left.dtype),
        scratch_shapes=[pltpu.VMEM((max_disp, wp, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wp * c * max_disp,
            bytes_accessed=2 * left.size * left.dtype.itemsize
            + n * h * wp * max_disp * left.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(left, right)
    return out[..., :w] if wp != w else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _corr_core(left, right, max_disp: int):
    return _corr_pallas_nhwc(left, right, max_disp)


def _corr_fwd(left, right, max_disp: int):
    return _corr_core(left, right, max_disp), (left, right)


def _corr_bwd(max_disp: int, res, g):
    left, right = res
    n, h, w, c = left.shape
    g = g.astype(jnp.float32)  # (N, H, D, W)
    # dL[x, c] = sum_d g[d, x] * R[x - d, c]
    x_idx = jnp.arange(w)[None, :] - jnp.arange(max_disp)[:, None]  # (D, W)
    valid = x_idx >= 0
    r_shift = jnp.where(
        valid[None, None, :, :, None],
        right[:, :, jnp.clip(x_idx, 0), :].astype(jnp.float32),
        0.0)  # (N, H, D, W, C)
    dleft = jnp.einsum("nhdw,nhdwc->nhwc", g, r_shift)
    # dR[y, c] = sum_d g[d, y + d] * L[y + d, c]
    y_idx = jnp.arange(w)[None, :] + jnp.arange(max_disp)[:, None]  # (D, W)
    validr = y_idx < w
    yc = jnp.clip(y_idx, 0, w - 1)
    g_shift = jnp.where(
        validr[None, None],
        jnp.take_along_axis(
            g, jnp.broadcast_to(yc[None, None], (n, h, max_disp, w)),
            axis=3),
        0.0)  # (N, H, D, W->y)
    l_shift = jnp.where(validr[None, None, :, :, None],
                        left[:, :, yc, :].astype(jnp.float32), 0.0)
    dright = jnp.einsum("nhdw,nhdwc->nhwc", g_shift, l_shift)
    return dleft.astype(left.dtype), dright.astype(right.dtype)


_corr_core.defvjp(_corr_fwd, _corr_bwd)


def corr_cost_volume_pallas(left, right, max_disp: int):
    """NHWC pair -> (N, H, D, W) correlation volume.

    Note the axis order differs from `ops.corr_cost_volume` (NDHWC): this
    layout needs zero transposes on either side of the kernel — consumers
    soft-argmax over axis 2 and get back an (N, H, W) map aligned with
    the NHWC feature tensors.
    """
    return _corr_core(left, right, max_disp)


# ------------------------------------------------------- concat variant


def _concat_kernel(l_ref, r_ref, o_ref, *, max_disp: int, w: int):
    l = l_ref[0, 0]  # (W, C)
    r = r_ref[0, 0].astype(jnp.float32)  # 32-bit for the sublane rotate
    c = l.shape[1]
    row = lax.broadcasted_iota(jnp.int32, (w, 1), 0)

    def body(d, _):
        o_ref[0, 0, pl.ds(d, 1), :, :c] = l[None]
        rd = pltpu.roll(r, shift=d, axis=0)
        o_ref[0, 0, pl.ds(d, 1), :, c:] = jnp.where(
            row >= d, rd, 0.0).astype(l.dtype)[None]
        return 0

    lax.fori_loop(0, max_disp, body, 0)


def cost_volume_pallas(left, right, max_disp: int):
    """Concat cost volume (`costVolumeCopy[Pad]Kernel`,
    `kernels.cu:51-97`): NHWC pair -> (N, D, H, W, 2C)... emitted as
    (N, H, D, W, 2C) internally and transposed by XLA once."""
    n, h, w, c = left.shape
    left = _pad_axis(left, 2)
    right = _pad_axis(right, 2)
    wp = left.shape[2]
    kernel = functools.partial(_concat_kernel, max_disp=max_disp, w=wp)
    feat_spec = pl.BlockSpec((1, 1, wp, c), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, max_disp, wp, 2 * c),
                            lambda i, j: (i, j, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n, h),
        in_specs=[feat_spec, feat_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, max_disp, wp, 2 * c),
                                       left.dtype),
        interpret=_interpret(),
    )(left, right)
    out = out[:, :, :, :w]
    return jnp.transpose(out, (0, 2, 1, 3, 4))  # -> (N, D, H, W, 2C)
