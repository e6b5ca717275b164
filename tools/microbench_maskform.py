"""Composed A/B of the per-LAYER pad-slot mask lowering (packed3d
`mask_form`) on the 3D zoo.

The r3 module-wide flip showed 'mul' wins the isolated conv3D_2 A/B
(7.02 -> 5.50 ms) but loses whole-model (29.4 -> 31.0) — an
all-or-nothing measurement that can hide a mixed optimum.  This sweeps
REDTAIL_TPU_MASK_MUL layer subsets composed, strict chained latency.

    env -u XLA_FLAGS python tools/microbench_maskform.py [model]
"""

import dataclasses
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax.numpy as jnp
import numpy as np

from redtail_tpu.runtime import enable_compilation_cache
from redtail_tpu.runtime.layer_profiler import device_time_fn

CONFIGS = {
    "nvsmall": [
        "",
        "conv3D_2",
        "conv3D_2,conv3D_4",
        "conv3D_2,deconv3D_1,deconv3D_2",
        "conv3D_2,conv3D_4,conv3D_5,deconv3D_1,deconv3D_2,deconv3D_3",
    ],
    "resnet18": [
        "",
        "conv3D_1b",
        "conv3D_1b,conv3D_2a,conv3D_2b",
    ],
}


def main():
    enable_compilation_cache()
    from redtail_tpu.models import (STEREO_SPECS, init_stereo_params,
                                    stereo_forward)
    from redtail_tpu.ops.space_to_depth import space_to_depth2_np

    model = sys.argv[1] if len(sys.argv) > 1 else "nvsmall"
    spec = dataclasses.replace(STEREO_SPECS[model], input_hw=(321, 1025))
    params = init_stereo_params(spec, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    left = space_to_depth2_np(rs.rand(1, 321, 1025, 3).astype(np.float32))
    right = space_to_depth2_np(rs.rand(1, 321, 1025, 3).astype(np.float32))
    inputs = (jnp.asarray(left, jnp.bfloat16),
              jnp.asarray(right, jnp.bfloat16))

    for cfg in CONFIGS[model]:
        os.environ["REDTAIL_TPU_MASK_MUL"] = cfg

        def fn(lt, rt):
            return stereo_forward(spec, params, lt, rt)

        t = device_time_fn(fn, inputs, n_lo=5, n_hi=35)
        print(f"{model} mul=[{cfg or '-'}]  {t * 1e3:7.3f} ms", flush=True)
        os.environ.pop("REDTAIL_TPU_MASK_MUL", None)


if __name__ == "__main__":
    main()
