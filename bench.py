"""Benchmark: ResNet18-2D stereo at 1025x321, batch 1, bf16, one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: the model runs inside an on-device `lax.scan` whose carry
forces a data dependency between iterations (async dispatch through the
harness tunnel makes host-side `block_until_ready` unreliable for timing).
Two loop lengths (10 / 110) cancel the fixed host<->device round-trip, so
the reported time is pure sustained per-frame device time.

Baseline derivation (BASELINE.md): the reference's best number for this
model is 9 ms/image on a Titan Xp at 513x257 (TensorRT,
`stereoDNN/README.md:31`). Scaled to the 1025x321 north-star resolution by
pixel count (2.496x) that is ~22.5 ms → 44.5 fps. vs_baseline = fps / 44.5.
"""

import dataclasses
import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

BASELINE_FPS = 1000.0 / (9.0 * (1025 * 321) / (513 * 257))  # ≈ 44.5


def main():
    from redtail_tpu.models import (
        STEREO_SPECS, init_stereo_params, stereo_forward)
    from redtail_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()  # TRT-plan-file equivalent; amortizes compile

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(321, 1025))
    params = init_stereo_params(spec, dtype=jnp.bfloat16)

    h, w = spec.input_hw
    rs = np.random.RandomState(0)
    left = jnp.asarray(rs.rand(1, h, w, 3), jnp.bfloat16)
    right = jnp.asarray(rs.rand(1, h, w, 3), jnp.bfloat16)

    @partial(jax.jit, static_argnums=3)
    def loop(params, l, r, n):
        def body(carry, _):
            l, r = carry
            d = stereo_forward(spec, params, l, r)
            # serialize BOTH inputs on the output: iteration i+1 cannot
            # start until i finishes, so this measures true per-frame
            # latency, not cross-frame-overlapped throughput.
            eps = (jnp.mean(d) * 1e-30).astype(l.dtype)
            return (l + eps, r + eps), jnp.mean(d)
        _, ms = lax.scan(body, (l, r), None, length=n)
        return ms.sum()

    n_lo, n_hi = 10, 160
    for n in (n_lo, n_hi):
        float(loop(params, left, right, n))  # compile + warm

    def timed(n):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(loop(params, left, right, n))
            best = min(best, time.perf_counter() - t0)
        return best

    per_frame = (timed(n_hi) - timed(n_lo)) / (n_hi - n_lo)
    fps = 1.0 / per_frame

    print(json.dumps({
        "metric": "resnet18_2d_stereo_1025x321_bf16_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
