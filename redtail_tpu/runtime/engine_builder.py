"""Offline stereo engine builder — compiles in a PRISTINE process.

Why a separate process: XLA:CPU AOT serialization is only reliable for
executables compiled in a fresh process. Re-compiling the same program
later in a process suffixes internal function names
(`transpose_copy_fusion.1`), and the serialized artifact then fails to
execute after deserialization elsewhere ("Buffer Definition Event:
Function ... not found" — reproduced deterministically in
tests/test_runtime.py). The reference had the same build shape anyway:
TRT engines were built once, offline, then deserialized everywhere
(`sample_app/main.cpp:222-276`); this module IS that offline builder.

CLI (what `build_stereo_engine` spawns):
    python -m redtail_tpu.runtime.engine_builder \
        --model resnet18_2d --hw 321 1025 --dtype bf16 \
        --params params.npz --input-shape 1 161 513 12 --out eng.plan
"""

from __future__ import annotations

import argparse
import dataclasses
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

from redtail_tpu.utils.checkpoint import load_params, save_params


def build_stereo_engine(path, spec, params, input_shape, *,
                        dtype: str = "bf16", cpu: bool = False,
                        timeout: float = 1800.0):
    """Build + serialize a stereo engine in a pristine subprocess.

    ``input_shape``: the serving input shape for BOTH frames — raw
    (N, H, W, 3) or s2d-packed (N, ceil(H/2), ceil(W/2), 12)."""
    with tempfile.TemporaryDirectory() as td:
        pfile = Path(td) / "params.npz"
        save_params(params, pfile)
        cmd = [sys.executable, "-m", "redtail_tpu.runtime.engine_builder",
               "--model", spec.name,
               "--hw", str(spec.input_hw[0]), str(spec.input_hw[1]),
               "--max-disp", str(spec.max_disp),
               "--dtype", dtype,
               "--params", str(pfile),
               "--input-shape", *[str(s) for s in input_shape],
               "--out", str(path)] + (["--cpu"] if cpu else [])
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, cwd=str(Path(__file__).parents[2]))
        if r.returncode != 0:
            raise RuntimeError(f"engine build failed:\n{r.stderr[-2000:]}")
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(description="offline stereo engine builder")
    ap.add_argument("--model", required=True)
    ap.add_argument("--hw", type=int, nargs=2, required=True)
    ap.add_argument("--max-disp", type=int, required=True)
    ap.add_argument("--dtype", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--params", required=True)
    ap.add_argument("--input-shape", type=int, nargs=4, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from redtail_tpu.models import STEREO_SPECS, stereo_forward
    from redtail_tpu.runtime.cache import save_engine

    spec = dataclasses.replace(STEREO_SPECS[args.model],
                               input_hw=tuple(args.hw),
                               max_disp=args.max_disp)
    jdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    def cast(a):
        # jnp.issubdtype, not np.: ml_dtypes.bfloat16 (e.g. from a @bf16
        # checkpoint) is not an np.floating subtype and would silently
        # skip the requested cast.
        return jnp.asarray(a, jdt) if jnp.issubdtype(a.dtype, jnp.floating) \
            else jnp.asarray(a)
    params = jax.tree.map(cast, load_params(args.params))
    example = jnp.zeros(tuple(args.input_shape), jdt)
    save_engine(args.out, lambda p, l, r: stereo_forward(spec, p, l, r),
                params, example, example,
                extras={"params": jax.tree.map(np.asarray, params),
                        "model": args.model, "dtype": args.dtype,
                        "input_hw": list(spec.input_hw),
                        "input_shape": list(args.input_shape)})
    print(f"engine written to {args.out}")


if __name__ == "__main__":
    main()
