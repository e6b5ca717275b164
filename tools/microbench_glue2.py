"""Layout-conversion candidates, round 2: conversions AS convolutions.

Everything measured so far says convs are the only primitive running
near roofline on this chip; every reshape/strided-slice/dilation-pad
layout change is 10-70x off.  So: test pack (space-to-depth), unpack
(depth-to-space via lhs dilation), and pair-shift as identity-weight
convolutions at NVSmall shapes, plus the lhs-dilated packed-input
deconv form.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp
from jax import lax

from redtail_tpu.runtime import enable_compilation_cache
from redtail_tpu.runtime.layer_profiler import device_time_fn


def _r(shape, seed=0, dtype=jnp.bfloat16):
    return jnp.asarray(np.random.RandomState(seed).rand(*shape) * 0.1, dtype)


def conv(x, k, strides=(1, 1, 1), pads=((0, 0), (0, 0), (0, 0)),
         lhs_dilation=None):
    return lax.conv_general_dilated(
        x, k, strides, list(pads), lhs_dilation=lhs_dilation,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    enable_compilation_cache()
    C = 32
    x = _r((1, 48, 161, 513, C))            # unpacked volume act
    xp = _r((1, 24, 81, 513, 4 * C), 1)     # DH-packed
    xq = _r((1, 12, 81, 257, 128), 2)       # D-packed 64ch act

    # space-to-depth pack conv: kernel (2,2,1, C, 4C), block-identity
    k_s2d = np.zeros((2, 2, 1, C, 4 * C), np.float32)
    for ph in range(2):
        for pd in range(2):
            for c in range(C):
                k_s2d[pd, ph, 0, c, (ph * 2 + pd) * C + c] = 1.0
    k_s2d = jnp.asarray(k_s2d, jnp.bfloat16)

    # depth-to-space unpack conv: lhs-dilated identity (2,2,1, 4C, C)
    k_d2s = np.zeros((2, 2, 1, 4 * C, C), np.float32)
    for ph in range(2):
        for pd in range(2):
            for c in range(C):
                # output position parity (pd, ph) reads group (ph, pd)
                k_d2s[1 - pd, 1 - ph, 0, (ph * 2 + pd) * C + c, c] = 1.0
    k_d2s = jnp.asarray(k_d2s, jnp.bfloat16)

    # pair-shift conv on packed: (2,1,1, 4C, 4C) moving pd slots
    k_shift = np.zeros((2, 1, 1, 4 * C, 4 * C), np.float32)
    for ph in range(2):
        for c in range(C):
            # Xs[a] = (X[2a-1], X[2a]): q0 <- prev slot pd=1, q1 <- pd=0
            k_shift[0, 0, 0, (ph * 2 + 1) * C + c, (ph * 2 + 0) * C + c] = 1.0
            k_shift[1, 0, 0, (ph * 2 + 0) * C + c, (ph * 2 + 1) * C + c] = 1.0
    k_shift = jnp.asarray(k_shift, jnp.bfloat16)

    kd_any = _r((2, 2, 2, 128, 256), 3)

    cases = [
        ("pack_s2d_conv", lambda a: conv(
            a, k_s2d, strides=(2, 2, 1),
            pads=((0, 0), (0, 1), (0, 0))), (x,)),
        ("unpack_d2s_conv", lambda a: conv(
            a, k_d2s, lhs_dilation=(2, 2, 1),
            pads=((1, 0), (1, -1), (0, 0))), (xp,)),
        ("shift_conv", lambda a: conv(
            a, k_shift, pads=((1, 0), (0, 0), (0, 0))), (xp,)),
        ("deconv_lhsdil_128to256", lambda a: conv(
            a, kd_any, lhs_dilation=(2, 1, 1),
            pads=((1, 0), (0, 1), (0, 1))), (xq,)),
    ]
    for name, fn, args in cases:
        out = fn(*args)
        sec = device_time_fn(fn, args)
        print(f"{name:<26s} {sec * 1e3:8.3f} ms   out={tuple(out.shape)}")


if __name__ == "__main__":
    main()
