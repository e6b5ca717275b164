"""Video -> frame extraction for dataset capture.

Equivalent of the camera-rig scripts
(`tools/camera_rig/scripts/videoParser.py` / `frameSplitter.py`): decode
a video, optionally subsample by stride or fps, and write numbered
frames into per-class or flat directories for the trail dataset builder.

Usage:
  python tools/video_to_frames.py input.mp4 outdir --stride 5 \
      --prefix sc --resize 320x180
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("video")
    p.add_argument("outdir")
    p.add_argument("--stride", type=int, default=1,
                   help="keep every Nth frame")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--limit", type=int, default=0, help="max frames (0=all)")
    p.add_argument("--prefix", default="frame")
    p.add_argument("--resize", default="", help="WxH, e.g. 320x180")
    p.add_argument("--ext", default="png", choices=["png", "jpg"])
    args = p.parse_args(argv)

    import cv2

    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)
    size = None
    if args.resize:
        w, h = (int(v) for v in args.resize.lower().split("x"))
        size = (w, h)
    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        print(f"cannot open {args.video}", file=sys.stderr)
        return 1
    if args.start:
        cap.set(cv2.CAP_PROP_POS_FRAMES, args.start)
    written = 0
    idx = args.start
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if (idx - args.start) % args.stride == 0:
            if size is not None:
                frame = cv2.resize(frame, size,
                                   interpolation=cv2.INTER_AREA)
            cv2.imwrite(str(out / f"{args.prefix}_{idx:06d}.{args.ext}"),
                        frame)
            written += 1
            if args.limit and written >= args.limit:
                break
        idx += 1
    cap.release()
    print(json.dumps({"frames_written": written, "outdir": str(out)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
