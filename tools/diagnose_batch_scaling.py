"""Why does flagship batching regress? (r2 finding: 387 fps b1 -> 313
b2 -> 231 b4 -> 105 b8 — 'HBM pressure' was the shrug; this quantifies
it.)

For each batch size: XLA's own memory analysis of the compiled program
(argument/output/temp/peak bytes) + measured chained latency, printed as
one table.  v5e HBM is 16 GB; the interesting number is TEMP bytes —
the live intermediates XLA must hold — and per-frame latency vs the
b1 baseline.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from bench import chained_latency
    from redtail_tpu.models import (
        STEREO_SPECS, init_stereo_params, stereo_forward)
    from redtail_tpu.ops.space_to_depth import space_to_depth2_np
    from redtail_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(321, 1025))
    params = init_stereo_params(spec, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)

    print(f"{'batch':>5s} {'args MB':>9s} {'temp MB':>9s} {'out MB':>8s} "
          f"{'ms/frame':>9s} {'fps':>7s}")
    for b in (1, 2, 4, 8):
        left = space_to_depth2_np(
            rs.rand(b, 321, 1025, 3).astype(np.float32))
        l = jnp.asarray(left, jnp.bfloat16)
        r = jnp.asarray(left[:, :, ::-1], jnp.bfloat16)
        fn = lambda a, c: stereo_forward(spec, params, a, c)  # noqa: E731
        compiled = jax.jit(fn).lower(l, r).compile()
        m = compiled.memory_analysis()
        sec = chained_latency(fn, (l, r), 5, 45)
        print(f"{b:5d} {m.argument_size_in_bytes / 2**20:9.1f} "
              f"{m.temp_size_in_bytes / 2**20:9.1f} "
              f"{m.output_size_in_bytes / 2**20:8.1f} "
              f"{sec * 1e3 / b:9.3f} {b / sec:7.1f}")


if __name__ == "__main__":
    main()
