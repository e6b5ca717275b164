"""DNN serving nodes: the `caffe_ros` / `stereo_dnn_ros` equivalents.

Each builds a jitted end-to-end function (fused ingest + model [+ device
postproc]) and exposes a callable suitable for `NodeGraph.add_node`. The
output contracts mirror the reference topics:

- stereo: (H, W) float32 disparity scaled by image width for the 2D model
  (`stereo_dnn_ros_node.cpp:77-95` publishes `32FC1` x w)
- TrailNet: 6 float probabilities (`caffe_ros.cpp:145-154`, `32FC6`)
- YOLO: (n, 6) [label, prob, x, y, w, h] (`caffe_ros.cpp:155-189`)
"""

from __future__ import annotations

import collections
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from redtail_tpu.runtime.graph import Stamped
from redtail_tpu.runtime.profiler import StageProfiler


class _OverlapMixin:
    """Frames-in-flight machinery shared by the DNN serving nodes.

    With ``overlap=N`` a node's call dispatches the current frame,
    starts its async device->host copy, and blocks only for the result
    dispatched N calls earlier — device compute and tunnel transfer
    overlap the host's pack + dispatch of the frames in between. The
    first N calls return None; afterwards each call returns
    `graph.Stamped` result(s) under their TRUE source stamps.

    The blocking fetch stays IN the node's own loop on purpose. On the
    remote-chip tunnel every alternative was measured worse: a fully
    synchronous node 7.9 fps, background fetcher pools 9-14 fps
    (concurrent blocking fetches from extra threads thrash the link),
    in-loop overlap=2 19.4 fps. One outstanding blocking op per stage
    is this link's sweet spot; on chip-local hardware (µs transfers)
    the fetch is free and overlap just hides dispatch latency.

    ``microbatch=M`` (with overlap) amortizes the per-fetch round-trip
    over M frames: frames accumulate host-side and dispatch as one
    batch-M executable; a ready batch returns a LIST of `Stamped`
    results (the graph publishes each under its own stamp). This is a
    high-RTT-link serving mode — it trades up to M-1 frame periods of
    latency for round-trip amortization; chip-local deployments keep
    M=1 (batch>1 also measured slower on-device at flagship shapes,
    see CLAUDE.md batch-collapse diagnosis)."""

    def _init_overlap(self, overlap: int, microbatch: int = 1) -> None:
        self.overlap = int(overlap)
        if self.overlap < 0:
            raise ValueError(f"overlap must be >= 0, got {overlap}")
        self.microbatch = max(1, int(microbatch))
        if self.microbatch > 1 and not self.overlap:
            raise ValueError("microbatch requires overlap >= 1")
        self.needs_stamp = self.overlap > 0
        self._inflight = collections.deque()
        self._batch = []  # (input(s), stamp) accumulating to microbatch

    def warmup(self, *inputs) -> None:
        """Compile + exercise every executable this serving config uses,
        then reset to empty queues. An overlapped/microbatched node only
        dispatches (compiles) once a full batch queues and only fetches
        once the in-flight queue exceeds ``overlap`` — tick
        microbatch*(overlap+1) times to force both, then drain.
        Synchronous nodes (overlap=0) get one plain call."""
        for _ in range(self.microbatch * (self.overlap + 1)):
            self(*inputs)
        self.drain()

    def _queue(self, out, metas) -> None:
        """Queue a dispatched device batch; ``metas`` is the list of
        per-frame meta tuples (stamp, ...)."""
        try:
            out.copy_to_host_async()  # best-effort early D2H start
        except Exception:
            pass
        self._inflight.append((out, metas))

    def _pop_ready(self):
        """Blocking-pop the oldest batch once the queue exceeds
        ``overlap``; returns (host_array, metas) or None."""
        if len(self._inflight) <= self.overlap:
            return None
        out, metas = self._inflight.popleft()
        return np.asarray(out), metas

    def _put(self, x):
        # device_put straight from host memory: uploading via
        # jnp.asarray first would land on the default device and then
        # ICI-copy to the pinned one (double transfer per frame).
        return jax.device_put(x, self._device) \
            if self._device is not None else jnp.asarray(x)

    def _serve(self, frame_input, meta, dispatch, finish, name):
        """Overlapped serving core shared by the DNN nodes (one copy of
        the accumulate/dispatch/fetch/wrap sequence so a fix can't land
        in one node and miss the others).

        ``frame_input``: this frame's host-prepped input (any object)
        that contributes exactly ONE row to the dispatched batch — the
        per-frame metas are matched to batch rows by position, so the
        nodes reject pre-batched (N>1) per-call inputs at entry;
        ``meta``: per-frame metadata whose LAST element is the source
        stamp; ``dispatch(inputs)``: list of frame_inputs -> device
        batch; ``finish(host_row, meta)``: one batch row -> host result.
        Returns None while the batch fills / the pipeline primes, else
        Stamped result(s) under true source stamps."""
        self._batch.append((frame_input, meta))
        if len(self._batch) < self.microbatch:
            return None
        with self.profiler.stage(f"{name}/dispatch"):
            inputs = [b[0] for b in self._batch]
            metas = [b[1] for b in self._batch]
            self._batch.clear()
            self._queue(dispatch(inputs), metas)
        with self.profiler.stage(f"{name}/fetch"):
            got = self._pop_ready()
        if got is None:
            return None
        res, metas = got
        outs = [Stamped(finish(res[i], m), m[-1])
                for i, m in enumerate(metas)]
        return outs if len(outs) > 1 else outs[0]

    def drain(self):
        """Block until everything in flight is fetched and discard it
        (warm-up / shutdown); also discards a partial microbatch. The
        next call starts a fresh pipeline."""
        self._batch.clear()
        while self._inflight:
            np.asarray(self._inflight.popleft()[0])

    def close(self):
        self.drain()


def tap_stage(node, on_result):
    """Wrap a serving node for `NodeGraph` so every result it produces
    also feeds ``on_result(data)`` (e.g. the controller's
    on_trailnet / on_objects callbacks) before publishing.

    Centralizes the Stamped / list-of-Stamped unwrap AND forwards
    ``needs_stamp`` — hand-rolled copies of this wrapper had to
    remember that attribute manually, and forgetting it silently
    re-stamped overlapped results at dispatch time (under-reporting
    camera->output latency, exactly what `graph.Stamped` exists to
    prevent)."""
    def stage(*frames, stamp=None):
        out = node(*frames, stamp=stamp) if node.needs_stamp \
            else node(*frames)
        for r in (out if isinstance(out, list)
                  else [out] if out is not None else []):
            on_result(r.data if isinstance(r, Stamped) else r)
        return out
    stage.needs_stamp = node.needs_stamp
    return stage


def _pin_params(params, device):
    """device_put every array blob of a CaffeNet param tree; non-array
    leaves (the lazy InnerProduct placeholder tuples of random-weight
    nets, `models/caffe_net.py:_inner_product`) pass through and
    materialize on first forward as usual."""
    return {name: [jax.device_put(b, device)
                   if isinstance(b, (np.ndarray, jnp.ndarray)) else b
                   for b in blobs]
            for name, blobs in params.items()}


def _host_resize(x_u8: np.ndarray, hw, *, interpolation: str) -> np.ndarray:
    """Resize camera frames to the model size ON THE HOST so the jitted
    graph sees ONE shape regardless of camera resolution — an in-jit
    resize shape-specializes the executable, and an unexpected size
    (e.g. a video codec rounding 257 rows to 256) triggered a mid-
    flight recompile that starved the node for minutes (found by
    thread-dump in the live pipeline). The reference likewise resized
    host-side (`tensor_net.cpp:303-336` preprocessImage, INTER_CUBIC
    for caffe models; INTER_AREA for the stereo apps)."""
    if x_u8.shape[-3:-1] == tuple(hw):
        return x_u8
    import cv2
    interp = {"cubic": cv2.INTER_CUBIC, "area": cv2.INTER_AREA}[interpolation]
    h, w = hw
    if x_u8.ndim == 3:
        return cv2.resize(x_u8, (w, h), interpolation=interp)
    return np.stack([cv2.resize(f, (w, h), interpolation=interp)
                     for f in x_u8])


class StereoNode(_OverlapMixin):
    """Stereo disparity stage. ``fn(left_bgr_u8, right_bgr_u8) -> disp``."""

    def __init__(self, spec, params, *, dtype=jnp.bfloat16,
                 quantize: Optional[str] = None,
                 calib_frames=None,
                 profiler: Optional[StageProfiler] = None,
                 device=None, overlap: int = 0, microbatch: int = 1,
                 wire: str = "f32"):
        """``quantize='w8'`` stores conv weights as per-channel int8 and
        dequantizes once at load — the weight-only rung of the reference's
        FP32/FP16/INT8 ladder (4x smaller weights at rest; accuracy gated
        in tests against the fp32 path). ``quantize='int8'`` additionally
        runs the 2D conv stacks as calibrated int8 x int8 -> int32 on the
        MXU (the reference's INT8 engine mode, `tensor_net.cpp:92-119`);
        supply ``calib_frames`` as (left, right) uint8 BGR pairs — they
        are preprocessed exactly like serving inputs.

        ``device``: optional `jax.Device` to pin this stage to — the
        multi-chip analogue of the reference's one-ROS-process-per-DNN
        pipeline parallelism (SURVEY §2.4: stages pinned to devices,
        frames crossing via ICI).  Default: the runtime's default
        device.

        ``overlap`` / ``microbatch``: frames-in-flight pipelining and
        round-trip amortization for high-RTT links — see
        `_OverlapMixin`. The reference got the overlap effect from ROS
        process isolation (each DNN node's GPU work overlapped the
        others' CPU work).

        ``wire``: disparity transport format. 'f32' (default) fetches
        raw float32; 'u16' fetches fixed-point round(disp * 64) uint16
        and converts host-side — half the device->host bytes at
        1/64 px quantization (<= 1023.98 px), finer than the
        reference's OWN published 16-bit PNG disparity format
        (`stereo_dnn_ros_viz`/sample app wrote disp x 256 for
        <= 255.99 px ranges, `sample_app/main.cpp:385-400`)."""
        from redtail_tpu.models import stereo_forward

        self.spec = spec
        self.profiler = profiler or StageProfiler()
        h, w = spec.input_hw
        if quantize == "int8":
            from redtail_tpu.quant.stereo_int8 import (
                calibrate_stereo, quantize_stereo_params_int8)
            if not calib_frames:
                raise ValueError("quantize='int8' requires calib_frames")

            def prep_np(x):
                x = np.asarray(x, np.float32)
                if x.shape[:2] != (h, w):
                    x = np.asarray(jax.image.resize(
                        jnp.asarray(x), (h, w, 3), "bilinear"))
                return x[..., ::-1] / 255.0  # BGR->RGB, [0,1]
            pairs = [(prep_np(l), prep_np(r)) for l, r in calib_frames]
            scales = calibrate_stereo(spec, params, pairs)
            params = quantize_stereo_params_int8(params, scales)
        elif quantize == "w8":
            from redtail_tpu.quant import quantize_stereo_params_w8
            from redtail_tpu.quant.ptq import dequantize_tree
            params = dequantize_tree(quantize_stereo_params_w8(params))
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize!r}")

        def cast_tree(node):
            out = {}
            for k, v in node.items():
                if isinstance(v, dict):
                    out[k] = cast_tree(v)
                elif k == "weights_q":
                    out[k] = jnp.asarray(v)          # int8 stays int8
                elif k in ("w_scale", "x_scale"):
                    out[k] = jnp.asarray(v, jnp.float32)  # exact dequant
                else:
                    out[k] = jnp.asarray(v, dtype)
            return out
        params = cast_tree(params)

        from redtail_tpu.ops.space_to_depth import use_s2d_stem
        # s2d stem: frames arrive host-packed (see `_host_prep`) and
        # conv1 runs its 3x3 form — every on-device pack measured slower
        # than the conv win (tools/microbench_enc2d.py); int8 conv1
        # keeps the raw stem (no packed int8 kernel).
        self._s2d = use_s2d_stem() and quantize != "int8"

        if wire not in ("f32", "u16"):
            raise ValueError(f"unknown wire format {wire!r}")
        self._wire = wire

        def run(params, left_in, right_in):
            def prep(x):
                x = x.astype(jnp.float32)
                if x.shape[-1] == 3:  # raw BGR frames
                    if x.shape[1:3] != (h, w):
                        x = jax.image.resize(x, (x.shape[0], h, w, 3),
                                             "bilinear")
                    x = x[..., ::-1]  # BGR->RGB (packed input arrives RGB)
                return (x / 255.0).astype(dtype)

            disp = stereo_forward(spec, params, prep(left_in), prep(right_in))
            if spec.corr:  # sigmoid-normalized -> pixels (x width)
                disp = disp * w
            if wire == "u16":
                return jnp.clip(jnp.round(disp.astype(jnp.float32) * 64.0),
                                0, 65535).astype(jnp.uint16)
            return disp.astype(jnp.float32)

        self._fn = jax.jit(run)
        self._hw = (h, w)
        self._device = device
        if device is not None:
            params = jax.device_put(params, device)
        self._params = params
        self._init_overlap(overlap, microbatch)

    def _host_prep(self, x_u8):
        """Resize (if needed) + BGR->RGB + s2d pack, all on host uint8:
        overlaps device compute in the pipeline; H2D bytes unchanged.
        The pack runs in the native runtime when built (fused single
        pass, 0.77 vs 8.2 ms/eye at flagship size — the numpy pack cost
        4x the whole flagship model's 2.1 ms device time per frame pair,
        i.e. it was the live-pipeline bottleneck); fallback bit-identical."""
        from redtail_tpu import native
        x_u8 = _host_resize(x_u8, self._hw, interpolation="area")
        return native.pack_s2d(x_u8, swap_rb=True)

    def __call__(self, left_u8, right_u8, stamp: Optional[float] = None):
        if left_u8.ndim == 3:
            left_u8, right_u8 = left_u8[None], right_u8[None]
        if len(left_u8) != 1 or len(right_u8) != 1:
            # One frame pair per call: the serving core matches batch
            # rows to per-call stamps by position, so a pre-batched
            # input would publish frames under the wrong stamps.
            # Batching is the NODE's job (microbatch=M).
            raise ValueError(
                "StereoNode serves one frame pair per call ((H, W, 3) "
                f"or (1, H, W, 3)); got leading dims "
                f"{len(left_u8)}/{len(right_u8)}")
        if not self._s2d:
            left_u8 = _host_resize(np.asarray(left_u8), self._hw,
                                   interpolation="area")
            right_u8 = _host_resize(np.asarray(right_u8), self._hw,
                                    interpolation="area")
        if self._s2d:
            with self.profiler.stage(f"stereo/{self.spec.name}/pack"):
                left_u8 = self._host_prep(np.asarray(left_u8))
                right_u8 = self._host_prep(np.asarray(right_u8))
        if not self.overlap:
            with self.profiler.stage(f"stereo/{self.spec.name}"):
                out = np.asarray(self._fn(self._params, self._put(left_u8),
                                          self._put(right_u8)))
            return self._from_wire(out[0])

        def dispatch(inputs):
            # single-frame batches skip the concatenate (a full-frame
            # host memcpy for nothing on the 1-core box)
            lp = inputs[0][0] if len(inputs) == 1 \
                else np.concatenate([i[0] for i in inputs])
            rp = inputs[0][1] if len(inputs) == 1 \
                else np.concatenate([i[1] for i in inputs])
            return self._fn(self._params, self._put(lp), self._put(rp))

        return self._serve(
            (left_u8, right_u8),
            (time.monotonic() if stamp is None else stamp,),
            dispatch, lambda row, m: self._from_wire(row),
            f"stereo/{self.spec.name}")

    def _from_wire(self, disp: np.ndarray) -> np.ndarray:
        if self._wire == "u16":
            return disp.astype(np.float32) / 64.0
        return disp


class VizNode:
    """Disparity-mosaic sink — the `stereo_dnn_ros_viz` node
    (`stereo_dnn_ros_viz_node.cpp:202-219`): 3-way-synced
    (left, right, disparity) -> 2x2 mosaic [L | R ; gray | KITTI-color],
    written to ``out_dir`` every ``every``-th frame.

    ``max_disp`` defaults to 96 like the reference's hardcoded value
    (`stereo_dnn_ros_viz_node.cpp:111`)."""

    def __init__(self, out_dir, *, max_disp: float = 96.0, every: int = 10,
                 profiler: Optional[StageProfiler] = None):
        import pathlib
        self.out_dir = pathlib.Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.max_disp = max_disp
        self.every = max(1, every)
        self.profiler = profiler or StageProfiler()
        self.frames = 0
        self.written = 0

    def __call__(self, left_bgr, right_bgr, disp) -> None:
        from redtail_tpu.runtime.viz import make_mosaic
        self.frames += 1
        if (self.frames - 1) % self.every:
            return None  # only BUILD the mosaics we persist — on a
            # small host the colormap work for dropped frames starved
            # the other node threads (1-core box: trailnet went 0 fps)
        with self.profiler.stage("viz"):
            mosaic = make_mosaic(np.asarray(left_bgr)[..., ::-1],
                                 np.asarray(right_bgr)[..., ::-1],
                                 np.asarray(disp, np.float32),
                                 self.max_disp)
            import cv2
            path = self.out_dir / f"mosaic_{self.written:05d}.png"
            cv2.imwrite(str(path), mosaic[..., ::-1])  # RGB -> BGR
            self.written += 1
        return None


class TrailNetNode(_OverlapMixin):
    """TrailNet stage: BGR uint8 frame -> 6 probabilities."""

    def __init__(self, net=None, *, profiler: Optional[StageProfiler] = None,
                 device=None, overlap: int = 0, microbatch: int = 1):
        from redtail_tpu.models.trailnet import INPUT_HW, load_trailnet

        self.net = net if net is not None else load_trailnet()
        self.profiler = profiler or StageProfiler()
        self._device = device
        if device is not None:
            # Pin the WEIGHTS to the stage's device too (stage-per-device
            # pipeline parallelism): without this only the per-call input
            # moved and the weight constants stayed wherever the net was
            # built. In place so `net.params` IS the pinned tree — the
            # dryrun asserts placement on it.
            self.net.params = _pin_params(self.net.params, device)
        h, w = INPUT_HW
        self._hw = (h, w)
        self._init_overlap(overlap, microbatch)

        def run(frame_u8):
            x = frame_u8.astype(jnp.float32)
            if x.ndim == 3:
                x = x[None]
            if x.shape[1:3] != (h, w):
                x = jax.image.resize(x, (x.shape[0], h, w, 3), "bilinear")
            # caffe_ros default inp_fmt is BGR with scale 1 shift 0
            # (`caffe_ros.cpp:41,51-52`); the graph's sub_mean normalizes.
            return self.net(x)

        self._fn = jax.jit(run)

    def __call__(self, frame_u8, stamp: Optional[float] = None):
        frame_u8 = np.asarray(frame_u8)
        if frame_u8.ndim == 4:  # single-frame serving contract: accept a
            if frame_u8.shape[0] != 1:  # (1, H, W, 3) batch-of-one only
                raise ValueError(
                    "TrailNetNode serves one frame per call; got batch "
                    f"of {frame_u8.shape[0]} (batching is the node's "
                    "job, microbatch=M)")
            frame_u8 = frame_u8[0]
        with self.profiler.stage("trailnet/pack"):
            frame_u8 = _host_resize(frame_u8, self._hw,
                                    interpolation="cubic")
        if not self.overlap:
            with self.profiler.stage("trailnet"):
                return np.asarray(self._fn(self._put(frame_u8)))[0]

        def dispatch(frames):
            x = frames[0] if len(frames) == 1 else np.stack(frames)
            return self._fn(self._put(x))

        return self._serve(
            frame_u8, (time.monotonic() if stamp is None else stamp,),
            dispatch, lambda row, m: row, "trailnet")


class YoloNode(_OverlapMixin):
    """YOLO stage: BGR uint8 frame -> (n, 6) detection matrix."""

    def __init__(self, net, *, prob_threshold: float = 0.15,
                 iou_threshold: float = 0.2,
                 profiler: Optional[StageProfiler] = None,
                 device=None, overlap: int = 0):
        self.net = net
        self.prob_threshold = prob_threshold
        self.iou_threshold = iou_threshold
        self.profiler = profiler or StageProfiler()
        self._device = device
        if device is not None:
            self.net.params = _pin_params(self.net.params, device)
        self._init_overlap(overlap)

        def run(frame_u8):
            x = frame_u8.astype(jnp.float32)
            if x.ndim == 3:
                x = x[None]
            if x.shape[1:3] != (448, 448):
                x = jax.image.resize(x, (x.shape[0], 448, 448, 3), "bilinear")
            return self.net(x)

        self._fn = jax.jit(run)

    def __call__(self, frame_u8, stamp: Optional[float] = None):
        from redtail_tpu.models import yolo

        frame_u8 = np.asarray(frame_u8)
        if frame_u8.ndim == 4 and frame_u8.shape[0] != 1:
            raise ValueError(
                "YoloNode serves one frame per call; got batch of "
                f"{frame_u8.shape[0]}")
        h, w = frame_u8.shape[:2] if frame_u8.ndim == 3 \
            else frame_u8.shape[1:3]
        frame_u8 = _host_resize(frame_u8, (448, 448),
                                interpolation="cubic")
        x = self._put(frame_u8)
        if not self.overlap:
            with self.profiler.stage("yolo/dnn"):
                raw = np.asarray(self._fn(x))[0]
            with self.profiler.stage("yolo/postproc"):
                return yolo.postprocess(raw, w, h,
                                        prob_threshold=self.prob_threshold,
                                        iou_threshold=self.iou_threshold)

        def finish(row, m):
            with self.profiler.stage("yolo/postproc"):
                return yolo.postprocess(
                    row, m[0], m[1], prob_threshold=self.prob_threshold,
                    iou_threshold=self.iou_threshold)

        return self._serve(
            x, (w, h, time.monotonic() if stamp is None else stamp),
            lambda inputs: self._fn(inputs[0]), finish, "yolo")
