"""D1 / EPE between two disparity maps (the reference's headline metric,
`stereoDNN/README.md:28-31,35-36` — it shipped the numbers but no tool).

Accepts `.npy`, the repo/reference `.bin` tensor format (rank, dims,
fp32 payload — `tests_main.cpp:259-275`), or 16-bit PNGs as written by
`stereo_app` (pass --png-scale to undo the write-time scaling: 256 for
the 3D models, image width for resnet18_2d — `main.cpp:317-330`).

Usage:
  python tools/eval_disparity.py pred.npy golden.npy [--dense]
  python tools/eval_disparity.py disp.png golden.npy --png-scale 256
"""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redtail_tpu.utils.metrics import disparity_errors  # noqa: E402


def load_disparity(path: str, png_scale: float = 256.0) -> np.ndarray:
    p = Path(path)
    if p.suffix == ".npy":
        arr = np.load(p)
    elif p.suffix == ".bin":
        from redtail_tpu.io import read_bin
        arr = read_bin(p)
    elif p.suffix in (".png", ".pgm"):
        import cv2
        arr = cv2.imread(str(p), cv2.IMREAD_UNCHANGED).astype(np.float32)
        arr = arr / png_scale
    else:
        raise ValueError(f"unsupported disparity format: {p.suffix}")
    return np.squeeze(np.asarray(arr, np.float32))


def main(argv=None):
    ap = argparse.ArgumentParser(description="D1/EPE disparity evaluation")
    ap.add_argument("pred")
    ap.add_argument("gt")
    ap.add_argument("--png-scale", type=float, default=256.0,
                    help="divide PNG values by this (256 for 3D models, "
                    "image width for resnet18_2d)")
    ap.add_argument("--dense", action="store_true",
                    help="treat every pixel as valid (dense reference, "
                    "e.g. a golden model output) instead of gt>0 sparse")
    args = ap.parse_args(argv)

    pred = load_disparity(args.pred, args.png_scale)
    gt = load_disparity(args.gt, args.png_scale)
    valid = np.ones_like(gt, bool) if args.dense else None
    out = disparity_errors(pred, gt, valid)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
