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
    p.add_argument("--weights", help="TRT-format weight blob, or a "
                   "*_golden.npz bundle (model|scope|layer|var keys)")
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
    p.add_argument("--hw", type=int, nargs=2, metavar=("H", "W"),
                   help="override the spec input size (any size works — "
                   "shapes derive at trace time; e.g. --hw 321 1025 for "
                   "the flagship bench config)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (numerics-only runs, e.g. "
                   "--accuracy tables, avoid the TPU compile service; "
                   "the env var is overridden by the harness, so this "
                   "pins it via jax.config before first device use)")
    p.add_argument("--accuracy", metavar="GOLDEN",
                   help="run every serving rung (fp32/bf16/packed/w8/int8) "
                   "on the input pair and print a D1/EPE table vs this "
                   "golden disparity (.npy/.bin; the reference headlined "
                   "D1, stereoDNN/README.md:28-31, but shipped no tool)")
    p.add_argument("--golden-scale", type=float, default=1.0,
                   help="multiply the golden by this to get pixels "
                   "(the NVTiny reference graph emits disparity/513; "
                   "resnet18_2d goldens are [0,1] and scale by width "
                   "automatically)")
    p.add_argument("--save-engine", metavar="PATH",
                   help="serialize the compiled executable + params to "
                   "PATH (the TRT .plan equivalent, main.cpp:269-275; "
                   "device-specific)")
    p.add_argument("--engine", metavar="PATH",
                   help="load a --save-engine artifact and run it: no "
                   "checkpoint, no tracing, no compilation "
                   "(main.cpp:198-220 plan-load flow; pass the same "
                   "--dtype it was built with)")
    return p


_ACCURACY_RUNGS = (
    # (name, dtype, env overrides, quantize)
    ("fp32", "fp32", {"REDTAIL_TPU_PACKED3D": "0",
                      "REDTAIL_TPU_FUSED_TOWERS": "0"}, None),
    ("bf16", "bf16", {"REDTAIL_TPU_PACKED3D": "0",
                      "REDTAIL_TPU_FUSED_TOWERS": "0"}, None),
    ("bf16+packed", "bf16", {"REDTAIL_TPU_PACKED3D": "1",
                             "REDTAIL_TPU_FUSED_TOWERS": "1"}, None),
    ("w8", "bf16", {"REDTAIL_TPU_PACKED3D": "1",
                    "REDTAIL_TPU_FUSED_TOWERS": "1"}, "w8"),
    ("int8", "bf16", {"REDTAIL_TPU_PACKED3D": "1",
                      "REDTAIL_TPU_FUSED_TOWERS": "1"}, "int8"),
)


def run_accuracy_table(spec, args, left_f32, right_f32, golden_px, w):
    """Disparity accuracy (D1/EPE in px) per serving rung vs a golden map.

    Each rung re-runs the full forward in its serving configuration
    (dtype + packed/fused paths + quantization); D1/EPE computed dense
    (the golden is a dense model output, not sparse KITTI GT)."""
    import os

    import jax
    import jax.numpy as jnp

    from redtail_tpu.models import stereo_forward
    from redtail_tpu.utils.metrics import disparity_errors

    dense = np.ones_like(golden_px, bool)
    rows = []
    for name, dtype, env, quantize in _ACCURACY_RUNGS:
        params = load_params(
            argparse.Namespace(**{**vars(args), "dtype": dtype}), spec)
        jdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        l = jnp.asarray(left_f32, jdt)
        r = jnp.asarray(right_f32, jdt)
        if quantize == "w8":
            from redtail_tpu.quant import quantize_stereo_params_w8
            from redtail_tpu.quant.ptq import dequantize_tree
            params = dequantize_tree(quantize_stereo_params_w8(params),
                                     dtype=jdt)
        elif quantize == "int8":
            from redtail_tpu.quant import (calibrate_stereo,
                                           quantize_stereo_params_int8)
            scales = calibrate_stereo(
                spec, params, [(np.asarray(left_f32[0]),
                                np.asarray(right_f32[0]))])
            params = quantize_stereo_params_int8(params, scales)
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            disp = np.asarray(jax.jit(
                lambda p, a, b: stereo_forward(spec, p, a, b))(params, l, r),
                np.float32)[0]
        finally:
            for k, v in saved.items():
                os.environ.pop(k, None) if v is None \
                    else os.environ.__setitem__(k, v)
        disp_px = disp * w if spec.corr else disp
        m = disparity_errors(disp_px, golden_px, dense)
        rows.append({"rung": name, "d1": m["d1"], "epe": m["epe"],
                     "err_max": m["err_max"]})
    return rows


def load_params(args, spec):
    import jax.numpy as jnp

    from redtail_tpu.models import (
        init_stereo_params, load_stereo_params, params_from_trt_blob)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.checkpoint:
        return load_stereo_params(args.checkpoint, dtype=dtype)
    if args.weights:
        if args.weights.endswith(".npz"):
            from redtail_tpu.models import params_from_npz
            return params_from_npz(args.weights, dtype=dtype)
        from redtail_tpu.io import read_trt_weights
        blob = read_trt_weights(args.weights, dtype=args.weights_dtype)
        return params_from_trt_blob(spec, blob, dtype=dtype)
    print("warning: no weights given, using random init", file=sys.stderr)
    return init_stereo_params(spec, dtype=dtype)


def main(argv=None):
    args = build_argparser().parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

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
    if args.hw:
        import dataclasses
        spec = dataclasses.replace(spec, input_hw=tuple(args.hw))
    prof = StageProfiler()
    if not args.engine:
        with prof.stage("load_weights"):
            params = load_params(args, spec)
    h, w = spec.input_hw
    with prof.stage("preprocess"):
        left = preprocess_stereo_host(cv2.imread(args.left), w, h)[None]
        right = preprocess_stereo_host(cv2.imread(args.right), w, h)[None]
        if args.dtype == "bf16":
            left = left.astype(jnp.bfloat16)
            right = right.astype(jnp.bfloat16)

    if args.engine:
        # Plan-file flow (`main.cpp:198-220`): deserialize the compiled
        # executable + params; no checkpoint, no tracing, no compile.
        from redtail_tpu.runtime.cache import load_engine
        with prof.stage("load_engine"):
            call, extras = load_engine(args.engine)
            params = jax.tree.map(jnp.asarray, extras["params"])
        with prof.stage("execute"):
            disp = np.asarray(call(params, left, right), np.float32)[0]
        out = Path(args.out)
        write_bin(disp, out.with_suffix(".bin"))
        scale = w if spec.corr else 256.0
        cv2.imwrite(str(out.with_suffix(".png")),
                    np.clip(disp * scale, 0, 65535).astype(np.uint16))
        if args.profile:
            print(prof.report(), file=sys.stderr)
        print(json.dumps({"model": args.model, "shape": list(disp.shape),
                          "disp_mean": float(disp.mean()),
                          "engine": args.engine,
                          "out": str(out.with_suffix(".bin"))}))
        return

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

    if args.save_engine:
        # Engines compile in a PRISTINE subprocess (XLA AOT artifacts
        # from a process that already compiled are not portable — see
        # runtime/engine_builder.py; the reference likewise built TRT
        # plans in a dedicated builder pass, main.cpp:222-276).
        from redtail_tpu.runtime.engine_builder import build_stereo_engine
        with prof.stage("save_engine"):
            build_stereo_engine(args.save_engine, spec, params,
                                np.asarray(left).shape, dtype=args.dtype,
                                cpu=args.cpu)
        print(f"engine saved to {args.save_engine}", file=sys.stderr)

    if args.profile_layers:
        from redtail_tpu.ops.space_to_depth import (
            space_to_depth2_np, use_s2d_stem)
        from redtail_tpu.runtime.layer_profiler import (
            format_layer_table, profile_stereo_layers)
        pl, pr = left, right
        if use_s2d_stem() and args.quantize != "int8":
            # profile the SERVING input contract (s2d-packed frames)
            pl = jnp.asarray(space_to_depth2_np(np.asarray(left, np.float32)),
                             left.dtype)
            pr = jnp.asarray(space_to_depth2_np(np.asarray(right, np.float32)),
                             right.dtype)
        with prof.stage("profile_layers"):
            rows, e2e = profile_stereo_layers(spec, params, pl, pr)
        print(format_layer_table(rows, e2e), file=sys.stderr)

    if args.accuracy:
        if args.accuracy.endswith(".npy"):
            golden = np.squeeze(np.load(args.accuracy))
        elif args.accuracy.endswith(".npz"):
            # the checked-in golden bundles (tests/data/*_golden.npz)
            # carry the reference-graph disparity under 'disp'
            golden = np.squeeze(np.load(args.accuracy)["disp"])
        else:
            from redtail_tpu.io import read_bin
            golden = np.squeeze(read_bin(args.accuracy))
        golden_px = golden * w if spec.corr else golden * args.golden_scale
        rows = run_accuracy_table(spec, args, np.asarray(left, np.float32),
                                  np.asarray(right, np.float32),
                                  golden_px, w)
        print(f"{'rung':<12s} {'D1 %':>8s} {'EPE px':>8s} {'max px':>8s}",
              file=sys.stderr)
        for r in rows:
            print(f"{r['rung']:<12s} {100 * r['d1']:8.3f} "
                  f"{r['epe']:8.4f} {r['err_max']:8.3f}", file=sys.stderr)
        print(json.dumps({"model": args.model, "accuracy": rows}))

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
