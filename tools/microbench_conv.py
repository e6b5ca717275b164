"""Isolated conv microbenchmarks on the real chip (chained-latency method).

Measures XLA's achieved TFLOP/s for the conv shapes that dominate the 3D
stereo models and the flagship encoder, including the proposed
'channel-packed' reformulations (fold D/H/W pairs into channels so every
conv runs at ~128 channels — full MXU lanes — at a 1.33-1.78x FLOP
overhead).  Decides packed-vs-native before any model surgery.

Usage: python tools/microbench_conv.py [case ...]
"""

import os
import sys

# NOTE: sys.path, not PYTHONPATH — a PYTHONPATH entry breaks the axon
# jax-plugin namespace-package discovery in this environment.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from redtail_tpu.runtime import enable_compilation_cache
from redtail_tpu.runtime.layer_profiler import device_time_fn


def conv3d_case(in_shape, c_out, kernel, strides=(1, 1, 1)):
    """Returns (fn, args, useful_flops_of_this_dense_conv)."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(*in_shape), jnp.bfloat16)
    w = jnp.asarray(rs.rand(*kernel, in_shape[-1], c_out) * 0.1,
                    jnp.bfloat16)

    def fn(x, w):
        pads = [(k // 2, (k - 1) // 2) for k in kernel]
        return lax.conv_general_dilated(
            x, w, strides, pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    out_vox = np.prod([(s + st - 1) // st
                       for s, st in zip(in_shape[1:4], strides)])
    flops = 2 * out_vox * np.prod(kernel) * in_shape[-1] * c_out
    return fn, (x, w), flops


def conv2d_case(in_shape, c_out, kernel=(3, 3), strides=(1, 1)):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(*in_shape), jnp.bfloat16)
    w = jnp.asarray(rs.rand(*kernel, in_shape[-1], c_out) * 0.1,
                    jnp.bfloat16)

    def fn(x, w):
        pads = [(k // 2, (k - 1) // 2) for k in kernel]
        return lax.conv_general_dilated(
            x, w, strides, pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    out_px = np.prod([(s + st - 1) // st
                      for s, st in zip(in_shape[1:3], strides)])
    flops = 2 * out_px * np.prod(kernel) * in_shape[-1] * c_out
    return fn, (x, w), flops


# name -> (builder, useful_flops_override or None, note)
CASES = {
    # --- NVSmall 3D stack, native shapes (C=32 at full-res volume)
    "conv3D_2_native": (
        lambda: conv3d_case((1, 48, 161, 513, 32), 32, (3, 3, 3)), None,
        "the 7.7%-MFU baseline"),
    "conv3D_4_native": (
        lambda: conv3d_case((1, 24, 81, 257, 64), 64, (3, 3, 3)), None,
        "64ch quarter-res"),
    "conv3D_7_native": (
        lambda: conv3d_case((1, 12, 41, 129, 128), 128, (3, 3, 3)), None,
        "128ch eighth-res"),
    # --- packed reformulations of conv3D_2 (useful flops = the native op's)
    "conv3D_2_Dpack": (
        lambda: conv3d_case((1, 24, 161, 513, 64), 64, (2, 3, 3)),
        2 * 48 * 161 * 513 * 27 * 32 * 32,
        "D-pairs in channels, kd=2: 1.33x dense overhead"),
    "conv3D_2_DHpack": (
        lambda: conv3d_case((1, 24, 81, 513, 128), 128, (2, 2, 3)),
        2 * 48 * 161 * 513 * 27 * 32 * 32,
        "DxH 2x2 in channels: 1.78x dense overhead, 128 lanes"),
    "conv3D_2_DHWpack": (
        lambda: conv3d_case((1, 24, 81, 257, 256), 256, (2, 2, 2)),
        2 * 48 * 161 * 513 * 27 * 32 * 32,
        "DxHxW 2x2x2: 2.37x overhead, 256ch"),
    # --- the big 128-ch conv3d at packed geometry (proxy for packed 4/5)
    "conv3D_4_Dpack": (
        lambda: conv3d_case((1, 12, 81, 257, 128), 128, (2, 3, 3)),
        2 * 24 * 81 * 257 * 27 * 64 * 64,
        "conv3D_4 with D-pairs: 1.33x overhead, 128 lanes"),
    # --- strided: conv3D_3ds native vs packed-input form
    "conv3D_3ds_native": (
        lambda: conv3d_case((1, 48, 161, 513, 32), 64, (3, 3, 3), (2, 2, 2)),
        None, "stride-2 downsample"),
    "conv3D_3ds_packin": (
        lambda: conv3d_case((1, 24, 81, 513, 128), 128, (3, 2, 3), (2, 1, 2)),
        2 * 24 * 81 * 257 * 27 * 32 * 64,
        "DH-packed input, D-packed 128ch output"),
    # --- flagship encoder conv (C=32 at 161x513) vs HW-packed
    "enc2d_native": (
        lambda: conv2d_case((1, 161, 513, 32), 32), None,
        "flagship resblock conv"),
    "enc2d_HWpack": (
        lambda: conv2d_case((1, 81, 257, 128), 128, (2, 2)),
        2 * 161 * 513 * 9 * 32 * 32,
        "HxW 2x2 in channels: 1.78x overhead"),
    "enc2d_c128_ref": (
        lambda: conv2d_case((1, 161, 513, 128), 128), None,
        "what 128ch 2D conv achieves at this size"),
    # --- deconv3D_2-equivalent flop volume as a packed regular conv
    "deconv3D_2_packout": (
        lambda: conv3d_case((1, 12, 81, 257, 128), 8 * 32, (2, 2, 2)),
        2 * (24 * 81 * 257) * 27 * 64 * 32,
        "shuffle-form deconv with D-parity kept packed (k=2, 256ch out)"),
}


def main():
    enable_compilation_cache()
    names = sys.argv[1:] or list(CASES)
    peak = 197e12  # v5e bf16
    print(f"{'case':<24s} {'ms':>8s} {'TFLOP/s':>8s} {'MFU%':>6s} "
          f"{'eff-TFLOP/s':>11s} {'eff-MFU%':>8s}")
    for name in names:
        builder, useful, note = CASES[name]
        fn, args, dense_flops = builder()
        sec = device_time_fn(fn, args)
        tf = dense_flops / sec / 1e12
        eff = (useful or dense_flops) / sec / 1e12
        print(f"{name:<24s} {sec * 1e3:8.3f} {tf:8.1f} "
              f"{100 * tf / (peak / 1e12):6.1f} {eff:11.1f} "
              f"{100 * eff / (peak / 1e12):8.1f}  # {note}")


if __name__ == "__main__":
    main()
