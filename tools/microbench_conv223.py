"""A/B the Mosaic stride-1 packed conv (kernels/conv223_pallas.py)
against the XLA dense-conv lowering at NVSmall's conv3D_2 shape.

    env -u XLA_FLAGS python tools/microbench_conv223.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax.numpy as jnp
import numpy as np

from redtail_tpu.ops.packed3d import conv3d_packed
from redtail_tpu.runtime import enable_compilation_cache
from redtail_tpu.runtime.layer_profiler import device_time_fn


def _r(shape, seed=0, dtype=jnp.bfloat16):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), dtype)


def main():
    enable_compilation_cache()
    # NVSmall conv3D_2: packed 'dh' shifted input (1, 25, 82, 513, 128),
    # w (3,3,3,32,32), full_spatial (48, 161, 513)
    xp = _r((1, 25, 82, 513, 128), 0)
    w = _r((3, 3, 3, 32, 32), 1) * 0.2
    b = _r((32,), 2)
    kw = dict(full_spatial=(48, 161, 513), packed_h=True, in_shifted=True)

    def xla_fn(x_, w_, b_):
        os.environ.pop("REDTAIL_TPU_PALLAS_CONV3D", None)
        return conv3d_packed(x_, w_, b_, **kw)

    def pallas_fn(x_, w_, b_):
        os.environ["REDTAIL_TPU_PALLAS_CONV3D"] = "1"
        try:
            return conv3d_packed(x_, w_, b_, **kw)
        finally:
            os.environ.pop("REDTAIL_TPU_PALLAS_CONV3D", None)

    ref = np.asarray(xla_fn(xp, w, b), np.float32)
    got = np.asarray(pallas_fn(xp, w, b), np.float32)
    err = float(np.max(np.abs(got - ref)) / max(1e-9, np.max(np.abs(ref))))
    print(f"rel err vs XLA: {err:.2e}")
    assert err < 2e-2, err
    t_x = device_time_fn(xla_fn, (xp, w, b))
    print(f"conv3D_2 xla     {t_x * 1e3:7.3f} ms")
    t_p = device_time_fn(pallas_fn, (xp, w, b))
    print(f"conv3D_2 pallas  {t_p * 1e3:7.3f} ms   ({t_x / t_p:.2f}x)")


if __name__ == "__main__":
    main()
