"""Stereo inference CLI — the `nvstereo_sample_app` equivalent.

Reference behavior (`stereoDNN/sample_app/main.cpp:136-339`):
`<model_type> <weights> <left> <right> [out]` — read weights, preprocess
PNGs (resize INTER_AREA, BGR->RGB, /255), run the engine, write the
disparity as `.bin` (rank/dims/fp32) and a 16-bit PNG scaled by 256
(or by image width for resnet18_2d's sigmoid output, `main.cpp:317-330`).

Model loading order of preference: TF checkpoint prefix (shapes included)
-> TRT weight blob (shapes from the model spec) -> random init.

Usage:
  python -m redtail_tpu.apps.stereo_app nvtiny \
      --checkpoint /root/reference/stereoDNN/models/NVTiny/TensorFlow/model-inference-513x161-0 \
      --left left.png --right right.png --out disp
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="TPU stereo DNN inference")
    p.add_argument("model", choices=["nvtiny", "nvsmall", "resnet18",
                                     "resnet18_2d"])
    p.add_argument("--checkpoint", help="TF checkpoint prefix")
    p.add_argument("--weights", help="TRT-format weight blob")
    p.add_argument("--weights-dtype", default="fp32",
                   choices=["fp32", "fp16"])
    p.add_argument("--left", required=True)
    p.add_argument("--right", required=True)
    p.add_argument("--out", default="disp", help="output path stem")
    p.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"],
                   help="compute dtype (bf16 = the TPU fp16 path)")
    p.add_argument("--quantize", choices=["w8", "int8"],
                   help="w8: weight-only int8 (dequant at load); int8: "
                   "calibrated int8 activations for the 2D conv stacks "
                   "(the reference's INT8 engine mode), calibrated on "
                   "the input pair itself")
    p.add_argument("--profile", action="store_true",
                   help="print per-stage times (IProfiler equivalent)")
    p.add_argument("--profile-layers", action="store_true",
                   help="print the per-layer ms table (each spec layer "
                   "re-jitted in isolation and timed on-device — the "
                   "reference's printLayerTimes, main.cpp:52-81)")
    p.add_argument("--no-cache", action="store_true",
                   help="disable the persistent compilation cache")
    return p


def load_params(args, spec):
    import jax.numpy as jnp

    from redtail_tpu.models import (
        init_stereo_params, load_stereo_params, params_from_trt_blob)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.checkpoint:
        return load_stereo_params(args.checkpoint, dtype=dtype)
    if args.weights:
        from redtail_tpu.io import read_trt_weights
        blob = read_trt_weights(args.weights, dtype=args.weights_dtype)
        return params_from_trt_blob(spec, blob, dtype=dtype)
    print("warning: no weights given, using random init", file=sys.stderr)
    return init_stereo_params(spec, dtype=dtype)


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from redtail_tpu.io import write_bin
    from redtail_tpu.models import STEREO_SPECS, stereo_forward
    from redtail_tpu.ops.preprocess import preprocess_stereo_host
    from redtail_tpu.runtime import StageProfiler, enable_compilation_cache

    if not args.no_cache:
        enable_compilation_cache()

    spec = STEREO_SPECS[args.model]
    prof = StageProfiler()
    with prof.stage("load_weights"):
        params = load_params(args, spec)
    h, w = spec.input_hw
    with prof.stage("preprocess"):
        left = preprocess_stereo_host(cv2.imread(args.left), w, h)[None]
        right = preprocess_stereo_host(cv2.imread(args.right), w, h)[None]
        if args.dtype == "bf16":
            left = left.astype(jnp.bfloat16)
            right = right.astype(jnp.bfloat16)

    if args.quantize == "int8":
        from redtail_tpu.quant import (calibrate_stereo,
                                       quantize_stereo_params_int8)
        with prof.stage("calibrate"):
            scales = calibrate_stereo(
                spec, params, [(np.asarray(left[0]), np.asarray(right[0]))])
            params = quantize_stereo_params_int8(params, scales)
    elif args.quantize == "w8":
        from redtail_tpu.quant import quantize_stereo_params_w8
        from redtail_tpu.quant.ptq import dequantize_tree
        params = dequantize_tree(
            quantize_stereo_params_w8(params),
            dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32)

    fn = jax.jit(lambda p, l, r: stereo_forward(spec, p, l, r))
    with prof.stage("compile"):
        compiled = fn.lower(params, left, right).compile()
    with prof.stage("execute"):
        disp = np.asarray(compiled(params, left, right),
                          np.float32)[0]  # (H, W)

    if args.profile_layers:
        from redtail_tpu.runtime.layer_profiler import (
            format_layer_table, profile_stereo_layers)
        with prof.stage("profile_layers"):
            rows, e2e = profile_stereo_layers(spec, params, left, right)
        print(format_layer_table(rows, e2e), file=sys.stderr)

    out = Path(args.out)
    write_bin(disp, out.with_suffix(".bin"))
    scale = w if spec.corr else 256.0  # `main.cpp:325-327`
    png = np.clip(disp * scale, 0, 65535).astype(np.uint16)
    cv2.imwrite(str(out.with_suffix(".png")), png)
    if args.profile:
        print(prof.report(), file=sys.stderr)
    print(json.dumps({"model": args.model, "shape": list(disp.shape),
                      "disp_mean": float(disp.mean()),
                      "out": str(out.with_suffix(".bin"))}))


if __name__ == "__main__":
    main()
