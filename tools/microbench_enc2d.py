"""Flagship 2D-encoder conv variants: the resblocks are 77% of e2e at
6.6% MFU (32 of 128 MXU lanes).  Candidates:

- NCHW/NHWC layout combinations (pixels-on-lanes formulations),
- both towers as batch 2 vs block-diagonal channel packing (64 lanes,
  2x FLOPs),
- conv1 (5x5 s2 from 3ch, 0.8 TFLOP/s!) as space-to-depth + 3x3,
- a 4-resblock chain to see XLA's cross-layer fusion quality.
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


def conv(x, w, dn, strides=(1, 1), pads=((1, 1), (1, 1))):
    return lax.conv_general_dilated(
        x, w, strides, list(pads), dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(x.dtype)


def elu(x):
    return jnp.where(x > 0, x, jnp.expm1(x.astype(jnp.float32)).astype(x.dtype))


def main():
    enable_compilation_cache()
    H, W, C = 161, 513, 32
    x = _r((1, H, W, C))
    xc = _r((1, C, H, W), 1)
    w = _r((3, 3, C, C), 2)
    wo = jnp.transpose(w, (3, 2, 0, 1))  # OIHW
    x2 = _r((2, H, W, C), 3)
    xd = _r((1, H, W, 2 * C), 4)
    wdiag = jnp.zeros((3, 3, 2 * C, 2 * C), jnp.bfloat16)
    wdiag = wdiag.at[:, :, :C, :C].set(w).at[:, :, C:, C:].set(w)

    img = _r((1, 321, 1025, 3), 5)
    w1 = _r((5, 5, 3, 32), 6)
    # conv1 as space-to-depth(2x2) + 3x3: build 12-ch input + folded kernel
    img_pad = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)))
    s2d = jnp.concatenate(
        [img_pad[:, a::2, b::2][:, :161, :513]
         for a in (0, 1) for b in (0, 1)], axis=-1)  # (161,513,12)
    # folded kernel (3,3,12,32): tap (p,q) over s2d covers original
    # (2p+a-?, 2q+b-?) — offsets chosen so SAME aligns; exactness is
    # checked separately if adopted; here we measure cost only.
    w1f = _r((3, 3, 12, 32), 7)

    def resblock(a, w1_, w2_):
        y = elu(conv(a, w1_, ("NHWC", "HWIO", "NHWC")))
        y = conv(y, w2_, ("NHWC", "HWIO", "NHWC"))
        return elu(y + a)

    wA, wB = w, _r((3, 3, C, C), 8)

    cases = [
        ("conv_nhwc", lambda a: conv(a, w, ("NHWC", "HWIO", "NHWC")), (x,)),
        ("conv_nhwc+bias+elu", lambda a: elu(
            conv(a, w, ("NHWC", "HWIO", "NHWC")) + 0.1), (x,)),
        ("conv_nchw", lambda a: conv(a, wo, ("NCHW", "OIHW", "NCHW")), (xc,)),
        ("conv_nhwc_in_nchw_out", lambda a: conv(
            a, w, ("NHWC", "HWIO", "NCHW")), (x,)),
        ("conv_batch2", lambda a: conv(a, w, ("NHWC", "HWIO", "NHWC")),
         (x2,)),
        ("conv_blockdiag64", lambda a: conv(
            a, wdiag, ("NHWC", "HWIO", "NHWC")), (xd,)),
        ("conv1_5x5s2_native", lambda a: conv(
            a, w1, ("NHWC", "HWIO", "NHWC"), strides=(2, 2),
            pads=((1, 2), (1, 2))), (img,)),
        ("conv1_s2d_3x3", lambda a: conv(
            a, w1f, ("NHWC", "HWIO", "NHWC")), (s2d,)),
        ("conv1_s2d_incl_pack", lambda a: conv(jnp.concatenate(
            [jnp.pad(a, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, p::2, q::2]
             [:, :161, :513] for p in (0, 1) for q in (0, 1)], axis=-1),
            w1f, ("NHWC", "HWIO", "NHWC")), (img,)),
        ("resblock_single", lambda a: resblock(a, wA, wB), (x,)),
        ("resblock_chain4", lambda a: resblock(resblock(resblock(
            resblock(a, wA, wB), wA, wB), wA, wB), wA, wB), (x,)),
    ]

    # --- r3: pack-variant shootout at the FUSED-TOWER shapes (6-ch in,
    # 64-ch out — the production conv1 after block-diagonal fusion).
    img6 = _r((1, 321, 1025, 6), 9)
    w1_6 = _r((5, 5, 6, 64), 10)
    w1f_24 = _r((3, 3, 24, 64), 11)
    s2d6 = jnp.concatenate(
        [jnp.pad(img6, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, a::2, b::2]
         [:, :161, :513] for a in (0, 1) for b in (0, 1)], axis=-1)

    def pack_slices(a):
        ap = jnp.pad(a, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return jnp.concatenate([ap[:, p::2, q::2][:, :161, :513]
                                for p in (0, 1) for q in (0, 1)], axis=-1)

    def pack_reshape(a):
        ap = jnp.pad(a, ((0, 0), (0, 1), (0, 1), (0, 0)))
        n, h2, w2, c = ap.shape
        ap = ap.reshape(n, h2 // 2, 2, w2 // 2, 2, c)
        return ap.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, h2 // 2, w2 // 2, 4 * c)

    c6 = img6.shape[-1]
    ident = np.zeros((2, 2, c6, 4 * c6), np.float32)
    for p in (0, 1):
        for q in (0, 1):
            for ch in range(c6):
                ident[p, q, ch, (2 * p + q) * c6 + ch] = 1.0
    ident = jnp.asarray(ident, jnp.bfloat16)

    def pack_conv(a):
        # s2d as an identity-weight k=2 s=2 conv (pack on the MXU) —
        # same trick as packed3d's conv-only unpack.
        return conv(a, ident, ("NHWC", "HWIO", "NHWC"), strides=(2, 2),
                    pads=((0, 1), (0, 1)))

    cases += [
        ("f_conv1_5x5s2_native", lambda a: conv(
            a, w1_6, ("NHWC", "HWIO", "NHWC"), strides=(2, 2),
            pads=((1, 2), (1, 2))), (img6,)),
        ("f_conv1_s2d_3x3_only", lambda a: conv(
            a, w1f_24, ("NHWC", "HWIO", "NHWC")), (s2d6,)),
        ("f_pack_slices", pack_slices, (img6,)),
        ("f_pack_reshape", pack_reshape, (img6,)),
        ("f_pack_identconv", pack_conv, (img6,)),
        ("f_s2d_slices+3x3", lambda a: conv(
            pack_slices(a), w1f_24, ("NHWC", "HWIO", "NHWC")), (img6,)),
        ("f_s2d_reshape+3x3", lambda a: conv(
            pack_reshape(a), w1f_24, ("NHWC", "HWIO", "NHWC")), (img6,)),
        ("f_s2d_identconv+3x3", lambda a: conv(
            pack_conv(a), w1f_24, ("NHWC", "HWIO", "NHWC")), (img6,)),
    ]

    # --- r3: H-packed resblock chain (pairs of rows in channels,
    # 64 -> 128 lanes; banded kernels kh=2, 1.33x dense FLOPs).
    xbd = _r((1, 161, 513, 64), 12)          # block-diag tower state
    wbd1 = _r((3, 3, 64, 64), 13)
    wbd2 = _r((3, 3, 64, 64), 14)
    xhp = _r((1, 81, 513, 128), 15)          # H-packed state
    whp1 = _r((2, 3, 128, 128), 16)          # banded (dense cost model)
    whp2 = _r((2, 3, 128, 128), 17)

    def bd_resblock(a, wa, wb):
        y = elu(conv(a, wa, ("NHWC", "HWIO", "NHWC")))
        y = conv(y, wb, ("NHWC", "HWIO", "NHWC"))
        return elu(y + a)

    def hp_resblock(a, wa, wb):
        y = elu(conv(a, wa, ("NHWC", "HWIO", "NHWC"),
                     pads=((1, 0), (1, 1))))
        y = conv(y, wb, ("NHWC", "HWIO", "NHWC"),
                 pads=((0, 1), (1, 1)))
        return elu(y + a)

    cases += [
        ("bd_conv64", lambda a: conv(a, wbd1, ("NHWC", "HWIO", "NHWC")),
         (xbd,)),
        ("hp_conv128_banded", lambda a: conv(
            a, whp1, ("NHWC", "HWIO", "NHWC"), pads=((1, 0), (1, 1))),
         (xhp,)),
        ("bd_resblock_chain4", lambda a: bd_resblock(bd_resblock(
            bd_resblock(bd_resblock(a, wbd1, wbd2), wbd1, wbd2),
            wbd1, wbd2), wbd1, wbd2), (xbd,)),
        ("hp_resblock_chain4", lambda a: hp_resblock(hp_resblock(
            hp_resblock(hp_resblock(a, whp1, whp2), whp1, whp2),
            whp1, whp2), whp1, whp2), (xhp,)),
    ]
    for name, fn, args in cases:
        sec = device_time_fn(fn, args)
        print(f"{name:<24s} {sec * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
