"""A/B the dfold deconv's D-block split at the 3D models' final-deconv
shapes (NVSmall deconv3D_3, ResNet-18 deconv3D_5, both h_packed 'dh'
input, disparity-last output).

Smaller blocks read a narrower (contiguous) input-channel window —
fewer dense-band FLOPs — but dispatch more convs and shrink the
contraction depth; with h_packed's 8 parity groups, blk=16 still fills
8*16 = 128 output lanes.  Run on the real TPU:

    env -u XLA_FLAGS python tools/microbench_dfold.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax.numpy as jnp
import numpy as np

from redtail_tpu.ops.convolution import conv3d_transpose_dfold
from redtail_tpu.runtime import enable_compilation_cache
from redtail_tpu.runtime.layer_profiler import device_time_fn


def _r(shape, seed=0, dtype=jnp.bfloat16):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), dtype)


def sweep(name, x_shape, w_shape, out_spatial, blocks, reduce=False):
    from redtail_tpu.ops.softargmax import softargmin

    x = _r(x_shape, 0)
    w = _r(w_shape, 1, jnp.bfloat16)
    b = _r((w_shape[3],), 2, jnp.bfloat16)
    red = (lambda t: softargmin(t[..., 0], axis=-1)) if reduce else None
    ref = None
    for blk in blocks:
        def fn(x_, w_, b_, blk=blk):
            return conv3d_transpose_dfold(
                x_, w_, b_, out_spatial=out_spatial, d_packed=True,
                h_packed=True, layout="dlast", d_block=blk, reduce=red)
        out = np.asarray(fn(x, w, b), np.float32)
        if ref is None:
            ref = out
        else:
            err = float(np.max(np.abs(out - ref)) / np.max(np.abs(ref)))
            assert err < 2e-2, (name, blk, err)  # bf16-output ulps
        t = device_time_fn(fn, (x, w, b))
        tag = "+softargmin" if reduce else ""
        print(f"{name + tag:36s} blk={blk or 'auto':>4}  {t * 1e3:7.3f} ms")


def main():
    enable_compilation_cache()
    # NVSmall deconv3D_3: 'dh' packed input (Dp=24, Hs=81, W=513, 4*32)
    sweep("nvsmall_deconv3D_3", (1, 24, 81, 513, 128), (3, 3, 3, 1, 32),
          (96, 321, 1025), [None, 48, 32, 24, 16, 12])
    # ResNet-18 deconv3D_5: D_full=136, C=32 (`resnet18_1025x321_net.cpp`)
    sweep("resnet18_deconv3D_5", (1, 34, 81, 513, 128), (3, 3, 3, 1, 32),
          (136, 321, 1025), [None, 34, 24, 16])
    # The serving form: soft-argmin fused per parity map (reduce=) —
    # the full-res weaves run on scalar disparity maps, not the volume.
    sweep("nvsmall_deconv3D_3", (1, 24, 81, 513, 128), (3, 3, 3, 1, 32),
          (96, 321, 1025), [None, 32, 24, 16, 12], reduce=True)
    sweep("resnet18_deconv3D_5", (1, 34, 81, 513, 128), (3, 3, 3, 1, 32),
          (136, 321, 1025), [None, 24, 16, 12], reduce=True)


if __name__ == "__main__":
    main()
