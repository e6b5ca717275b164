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

    cases = [
        ("pack_dh(first_act)", lambda a: P.pack(a, d=True, h=True), (x,)),
        ("unpack_dh(volume)", lambda a: P.unpack(
            a, (D, H, W), d=True, h=True), (xp,)),
        ("shift_view_d", lambda a: P._shift_view(
            a, 1, group_pos=1, n_groups=2), (xp,)),
        ("shift_both", lambda a: P._shift_view(P._shift_view(
            a, 1, group_pos=1, n_groups=2), 2, group_pos=0, n_groups=2),
            (xp,)),
        ("zero_slots", lambda a: P._zero_pad_slots(
            a, (D, H, W), d=True, h=True), (xp,)),
        ("conv3D_2_packed_FULL", lambda a: P.conv3d_packed(
            a, w2, b2, full_spatial=(D, H, W), packed_h=True), (xp,)),
        ("conv3D_2_native+elu", lambda a: elu(conv3d(a, w2, b2)), (x,)),
        ("conv3D_4_packed_FULL", lambda a: P.conv3d_packed(
            a, w4, b4, full_spatial=(24, 81, 257), packed_h=False), (xq,)),
        ("conv3D_3ds_packed_FULL", lambda a: P.conv3d_packed_down(
            a, _r((3, 3, 3, 32, 64), 10), _r((64,), 11),
            full_spatial=(D, H, W), packed_h=True), (xp,)),
        ("deconv3D_2_topacked_FULL", lambda a: P.deconv3d_to_packed(
            a, wd2, bd2, out_spatial=(D, H, W), pack_h=True), (xu,)),
        ("deconv3D_2_native", lambda a: conv3d_transpose(
            a, wd2, bd2, out_spatial=(D, H, W), strides=(2, 2, 2)), (xu,)),
    ]
    for name, fn, args in cases:
        sec = device_time_fn(fn, args)
        print(f"{name:<28s} {sec * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
