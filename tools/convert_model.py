"""Model conversion CLI — the `model_builder.py` equivalent
(`stereoDNN/scripts/model_builder.py` + `tensorrt_model_builder.py`).

The reference converted TF checkpoints into generated C++ + a TRT weight
blob. Here no code generation is needed (models are spec-driven), so
conversion is pure weight re-packaging between the three formats the
framework speaks:

  TF checkpoint prefix  --read-->  param tree  --write-->  .npz archive
  TRT weight blob       --read-->             --write-->  TRT blob (fp32/fp16)

Usage:
  python tools/convert_model.py --model nvtiny \
      --checkpoint .../model-inference-513x161-0 \
      --out-blob trt_weights.bin --blob-dtype fp16 --out-npz params.npz
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def tree_to_blob(spec, params) -> dict:
    """Nested param tree -> flat TRT-blob dict (KCRS/KVCRS layouts,
    siamese left_/right_ duplication), inverse of `params_from_trt_blob`
    and byte-compatible with the reference's writer
    (`tensorrt_model_builder.py:52-60`)."""
    from redtail_tpu.models.stereo import _spec_layer_shapes

    blob = {}
    # identity scale weights the reference always emitted (:121-136)
    for side in ("left", "right"):
        blob[f"{side}_scale_shift"] = np.zeros(1, np.float32)
        blob[f"{side}_scale_scale"] = np.ones(1, np.float32)
        blob[f"{side}_scale_power"] = np.ones(1, np.float32)

    def node_at(path):
        node = params
        for p in path.split("/"):
            node = node[p]
        return node

    for path, kshape, _bshape in _spec_layer_shapes(spec):
        leaf = node_at(path)
        w = np.asarray(leaf["weights"])
        b = np.asarray(leaf["biases"])
        if len(kshape) == 4:   # RSCK -> KCRS
            wk = np.transpose(w, (3, 2, 0, 1))
        else:                  # VRSCK -> KVCRS
            wk = np.transpose(w, (4, 0, 3, 1, 2))
        layer = path.split("/", 1)[1].replace("/", "_")
        if path.startswith("encoder2D"):
            for side in ("left", "right"):
                blob[f"{side}_{layer}_k"] = wk
                blob[f"{side}_{layer}_b"] = b
        else:
            blob[f"{layer}_k"] = wk
            blob[f"{layer}_b"] = b
    return blob


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   choices=["nvtiny", "nvsmall", "resnet18", "resnet18_2d"])
    p.add_argument("--checkpoint", help="TF checkpoint prefix to read")
    p.add_argument("--in-blob", help="TRT blob to read instead")
    p.add_argument("--in-blob-dtype", default="fp32",
                   choices=["fp32", "fp16"])
    p.add_argument("--out-blob", help="write a TRT-format blob here")
    p.add_argument("--blob-dtype", default="fp32", choices=["fp32", "fp16"])
    p.add_argument("--out-npz", help="write an .npz param archive here")
    args = p.parse_args(argv)

    from redtail_tpu.io import read_trt_weights, write_trt_weights
    from redtail_tpu.models import (
        STEREO_SPECS, load_stereo_params, params_from_trt_blob)
    from redtail_tpu.utils import save_params

    spec = STEREO_SPECS[args.model]
    if args.checkpoint:
        params = load_stereo_params(args.checkpoint)
    elif args.in_blob:
        params = params_from_trt_blob(
            spec, read_trt_weights(args.in_blob, dtype=args.in_blob_dtype))
    else:
        print("need --checkpoint or --in-blob", file=sys.stderr)
        return 1
    wrote = []
    if args.out_blob:
        write_trt_weights(tree_to_blob(spec, params), args.out_blob,
                          dtype=args.blob_dtype)
        wrote.append(args.out_blob)
    if args.out_npz:
        save_params(params, args.out_npz)
        wrote.append(args.out_npz)
    print(json.dumps({"model": args.model, "wrote": wrote}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
