"""Regenerate end-to-end golden disparity fixtures from the reference's own
TensorFlow inference graphs.

Runs the shipped `.meta` graphs + checkpoints (NVTiny 513x161 and
ResNet-18_2D 513x257 — the two whose data files survive) on the shipped
sample stereo pair (`stereoDNN/sample_app/data/img_{left,right}.png`),
feeding the preprocessed images directly into the graph's model input
tensors (bypassing its file-queue Dataloader), and stores the left-view
disparity as `tests/data/{nvtiny,resnet18_2d}_golden_disp.npy`.

Notes on the graphs:
- NVTiny's graph ends with a Mul by 1/513 (disparity normalized by width);
  its golden output is therefore normalized — tests multiply back by 513.
- ResNet-18_2D's sigmoid output is already [0,1]-normalized.

Requires TensorFlow (only this offline tool does; the framework itself
never imports TF).
"""

import os
import warnings

warnings.filterwarnings("ignore")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

from pathlib import Path

import cv2
import numpy as np
import tensorflow.compat.v1 as tf

tf.disable_eager_execution()

REF = Path("/root/reference/stereoDNN")
OUT = Path(__file__).resolve().parent.parent / "tests" / "data"


def load_img(path, w, h):
    img = cv2.imread(str(path))
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    return img[None]


def run(prefix, w, h, feed_names, fetch):
    left = load_img(REF / "sample_app/data/img_left.png", w, h)
    right = load_img(REF / "sample_app/data/img_right.png", w, h)
    g = tf.Graph()
    with g.as_default():
        saver = tf.train.import_meta_graph(str(prefix) + ".meta",
                                           clear_devices=True)
        with tf.Session(
                config=tf.ConfigProto(allow_soft_placement=True)) as sess:
            saver.restore(sess, str(prefix))
            return sess.run(fetch, dict(zip(feed_names, [left, right])))


def main():
    OUT.mkdir(parents=True, exist_ok=True)

    d = run(REF / "models/NVTiny/TensorFlow/model-inference-513x161-0",
            513, 161,
            ["Dataloader/ExpandDims:0", "Dataloader/ExpandDims_1:0"],
            "disparities/ExpandDims:0")
    np.save(OUT / "nvtiny_golden_disp.npy", d)
    print("nvtiny:", d.shape, d.mean())

    d = run(REF / "models/ResNet-18_2D/TensorFlow/model-inference-513x257-0",
            513, 257,
            ["IteratorGetNext:0", "IteratorGetNext:1"],
            "disparities/ExpandDims:0")
    np.save(OUT / "resnet18_2d_golden_disp.npy", d)
    print("resnet18_2d:", d.shape, d.mean())


if __name__ == "__main__":
    main()
