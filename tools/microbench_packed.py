"""Attribute the packed-3D pipeline's composed cost: glue vs convs.

The packed convs win 1.7-3.1x isolated (microbench_conv.py) but the
composed NVSmall model measured SLOWER (71 vs 53 ms).  This times each
packed op COMPLETE (shift views + banded kernel + conv + bias + slot
zeroing) and each piece of glue alone, at the real NVSmall shapes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from redtail_tpu.ops import packed3d as P
from redtail_tpu.ops import conv3d, conv3d_transpose, elu
from redtail_tpu.runtime import enable_compilation_cache
from redtail_tpu.runtime.layer_profiler import device_time_fn


def _r(shape, seed=0, dtype=jnp.bfloat16):
    return jnp.asarray(np.random.RandomState(seed).rand(*shape) * 0.1, dtype)


def main():
    enable_compilation_cache()
    D, H, W, C = 48, 161, 513, 32
    x = _r((1, D, H, W, C))                      # first_act, unpacked
    xp = _r((1, 24, 81, W, 4 * C), 1)            # DH-packed volume act
    w2 = _r((3, 3, 3, C, C), 2)                  # conv3D_2 weights
    b2 = _r((C,), 3)
    xq = _r((1, 12, 81, 257, 128), 4)            # D-packed 64ch act
    w4 = _r((3, 3, 3, 64, 64), 5)
    b4 = _r((64,), 6)
    xu = _r((1, 24, 81, 257, 64), 7)             # unpacked deconv3D_2 input
    wd2 = _r((3, 3, 3, 32, 64), 8)
    bd2 = _r((32,), 9)

    xs = _r((1, 25, 82, W, 4 * C), 12)           # shifted-DH volume act
    xqp = _r((1, 12, 81, 257, 128), 13)          # aligned D-packed 64ch
    cases = [
        ("unpack_conv_dh(volume)", lambda a: P.unpack_conv(
            a, (D, H, W), packed_h=True), (xp,)),
        ("conv3D_2_pk_shift_in", lambda a: P.conv3d_packed(
            a, w2, b2, full_spatial=(D, H, W), packed_h=True,
            in_shifted=True), (xs,)),
        ("conv3D_2_pk_align_in", lambda a: P.conv3d_packed(
            a, w2, b2, full_spatial=(D, H, W), packed_h=True,
            in_shifted=False), (xp,)),
        ("conv3D_2_native+elu", lambda a: elu(conv3d(a, w2, b2)), (x,)),
        ("conv3D_4_pk_shift_in", lambda a: P.conv3d_packed(
            a, w4, b4, full_spatial=(24, 81, 257), packed_h=False,
            in_shifted=True), (_r((1, 13, 81, 257, 128), 14),)),
        ("conv3D_3ds_pk_FULL", lambda a: P.conv3d_packed_down(
            a, _r((3, 3, 3, 32, 64), 10), _r((64,), 11),
            full_spatial=(D, H, W), packed_h=True), (xp,)),
        ("deconv3D_2_pk_FULL", lambda a: P.deconv3d_packed(
            a, wd2, bd2, out_spatial=(D, H, W), in_packed_d=True,
            pack_h=True), (xqp,)),
        ("deconv3D_2_native", lambda a: conv3d_transpose(
            a, wd2, bd2, out_spatial=(D, H, W), strides=(2, 2, 2)), (xu,)),
    ]
    for name, fn, args in cases:
        sec = device_time_fn(fn, args)
        print(f"{name:<28s} {sec * 1e3:8.3f} ms")


def glue_variants():
    """Candidate glue implementations, NVSmall shapes."""
    from jax import lax
    enable_compilation_cache()
    ev = _r((1, 24, 81, 257, 128), 0)
    od = _r((1, 24, 81, 256, 128), 1)

    def weave_stack(a, b):  # current _weave_axis form (axis=3, out 513)
        from redtail_tpu.ops.convolution import _weave_axis
        return _weave_axis(a, b, 3, 513)

    def weave_dilate(a, b):
        cfg = [(0, 0, 0)] * 5
        cfg[3] = (0, 0, 1)
        az = lax.pad(a, jnp.zeros((), a.dtype), cfg)      # 2W-1 = 513
        cfg2 = [(0, 0, 0)] * 5
        cfg2[3] = (1, 0, 1)                                # odd slots
        bz = lax.pad(b, jnp.zeros((), b.dtype), cfg2)      # 513
        return az + bz

    x5 = _r((1, 48, 161, 513, 32), 2)

    def pack_slices(x):  # strided-slice pack (d then h)
        d0 = x[:, 0::2]
        d1 = x[:, 1::2]
        xp = jnp.concatenate([d0, d1], axis=-1)  # (24,161,513,64) (pd,c)
        h0 = xp[:, :, 0::2]
        h1 = jnp.pad(xp[:, :, 1::2], ((0, 0), (0, 0), (0, 1), (0, 0),
                                      (0, 0)))
        return jnp.concatenate([h0, h1], axis=-1)  # (24,81,513,128)

    xp = _r((1, 24, 81, 513, 128), 3)

    def unpack_dilate(y):  # (ph,pd,c) -> full, via two dilate-weaves
        ph0 = y[..., :64]
        ph1 = y[..., 64:]
        cfg = [(0, 0, 0)] * 5
        cfg[2] = (0, 1, 1)   # h: even slots, pad hi to 162
        a = lax.pad(ph0, jnp.zeros((), y.dtype), cfg)
        cfg2 = [(0, 0, 0)] * 5
        cfg2[2] = (1, 0, 1)
        b = lax.pad(ph1, jnp.zeros((), y.dtype), cfg2)
        yh = (a + b)[:, :, :161]  # (24,161,513,64) (pd,c)
        d0 = yh[..., :32]
        d1 = yh[..., 32:]
        cfg3 = [(0, 0, 0)] * 5
        cfg3[1] = (0, 0, 1)
        cfg4 = [(0, 0, 0)] * 5
        cfg4[1] = (1, 0, 1)
        return lax.pad(d0, jnp.zeros((), y.dtype), cfg3) + \
            lax.pad(d1, jnp.zeros((), y.dtype), cfg4)  # (48,161,513,32)

    def zero_slots_where(y):  # mask (ph=1, h2=last) via iota, no reshape
        h_idx = lax.broadcasted_iota(jnp.int32, y.shape, 2)
        c_idx = lax.broadcasted_iota(jnp.int32, y.shape, 4)
        return jnp.where((h_idx == 80) & (c_idx >= 64),
                         jnp.zeros((), y.dtype), y)

    for name, fn, args in [
        ("weave_W_stack(current)", weave_stack, (ev, od)),
        ("weave_W_dilate", weave_dilate, (ev, od)),
        ("pack_dh_slices", pack_slices, (x5,)),
        ("unpack_dh_dilate", unpack_dilate, (xp,)),
        ("zero_slots_where", zero_slots_where, (xp,)),
    ]:
        sec = device_time_fn(fn, args)
        print(f"{name:<28s} {sec * 1e3:8.3f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "glue":
        glue_variants()
    else:
        main()
