"""Frame sources: the `image_pub` node equivalent
(`ros/packages/image_pub/src/image_pub_node.cpp`): video file / image file /
synthetic frames published to a topic at a fixed rate, with repeat and
start-offset controls."""

from __future__ import annotations

import itertools
import threading
import time
from pathlib import Path
from typing import Callable, Iterator, Optional

import numpy as np

from redtail_tpu.runtime.graph import Topic


class FrameSource:
    """Publishes frames from an iterator factory to a topic at ``rate_hz``.

    ``frame_iter_factory`` is re-invoked when ``repeat`` and the stream is
    exhausted (image_pub's `img_repeat`, `image_pub_node.cpp:28-101`).
    """

    def __init__(self, topic: Topic, frame_iter_factory: Callable[[], Iterator],
                 rate_hz: float = 30.0, repeat: bool = False):
        self.topic = topic
        self.factory = frame_iter_factory
        self.rate_hz = rate_hz
        self.repeat = repeat
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.published = 0

    def _run(self):
        period = 1.0 / self.rate_hz if self.rate_hz > 0 else 0.0
        it = self.factory()
        while not self._stop.is_set():
            t0 = time.monotonic()
            try:
                frame = next(it)
            except StopIteration:
                if not self.repeat:
                    return
                it = self.factory()
                continue
            self.topic.publish(frame)
            self.published += 1
            dt = time.monotonic() - t0
            if period > dt:
                self._stop.wait(period - dt)

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self, timeout: float = 2.0):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)


class ImageFileSource(FrameSource):
    """Single image (or list of images) published repeatedly as BGR uint8."""

    def __init__(self, topic: Topic, paths, rate_hz: float = 30.0,
                 repeat: bool = True):
        paths = [Path(p) for p in (
            paths if isinstance(paths, (list, tuple)) else [paths])]
        missing = [p for p in paths if not p.is_file()]
        if missing:
            raise FileNotFoundError(f"image file(s) not found: {missing}")

        def factory():
            import cv2
            frames = []
            for p in paths:
                img = cv2.imread(str(p))
                if img is None:
                    raise RuntimeError(f"could not decode image {p}")
                frames.append(img)
            return iter(frames)

        super().__init__(topic, factory, rate_hz=rate_hz, repeat=repeat)


class VideoFileSource(FrameSource):
    """Video file decoded with OpenCV, with start-frame offset."""

    def __init__(self, topic: Topic, path, rate_hz: float = 30.0,
                 repeat: bool = False, start_frame: int = 0):
        if not Path(path).is_file():
            raise FileNotFoundError(f"video file not found: {path}")

        def factory():
            import cv2
            cap = cv2.VideoCapture(str(path))
            if not cap.isOpened():
                raise RuntimeError(f"could not open video {path}")
            if start_frame:
                cap.set(cv2.CAP_PROP_POS_FRAMES, start_frame)

            def frames():
                while True:
                    ok, frame = cap.read()
                    if not ok:
                        cap.release()
                        return
                    yield frame
            return frames()

        super().__init__(topic, factory, rate_hz=rate_hz, repeat=repeat)


class SyntheticSource(FrameSource):
    """Deterministic random frames for tests and soak runs."""

    def __init__(self, topic: Topic, shape=(180, 320, 3),
                 rate_hz: float = 30.0, seed: int = 0, count: int = 0):
        def factory():
            rs = np.random.RandomState(seed)
            it = itertools.count() if count == 0 else range(count)
            return (rs.randint(0, 256, shape, dtype=np.uint8) for _ in it)

        super().__init__(topic, factory, rate_hz=rate_hz,
                         repeat=(count == 0))
