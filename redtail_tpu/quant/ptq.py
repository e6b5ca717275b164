"""Post-training quantization utilities.

Three pieces, mirroring what TensorRT's INT8 builder + the reference's
`Int8EntropyCalibrator` (`int8_calibrator.cpp:49-110`) provided:

1. **Entropy calibration**: choose a clipping threshold per activation
   tensor by minimizing the KL divergence between the original activation
   distribution and its quantized projection (TRT's method, reimplemented
   from the published algorithm on numpy histograms).
2. **Weight quantization**: symmetric per-output-channel int8.
3. **Execution**: int8 x int8 convs accumulate in int32 on the MXU, with
   per-channel dequant scales fused into the output; and a cheaper
   weight-only mode (w8) whose dequant folds into the conv constant.

`calibrate_caffe_net` wires this into the Caffe interpreter so the
TrailNet/YOLO graphs run the same FP32 / FP16(bf16) / INT8 matrix the
reference tested (`caffe_ros/tests/tests_basic.launch`).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------- calibration


def entropy_threshold(samples: np.ndarray, num_bins: int = 2048,
                      target_bins: int = 128) -> float:
    """KL-optimal |x| clipping threshold (TensorRT entropy calibration).

    Builds a |x| histogram and evaluates, for each candidate threshold i,
    the KL divergence between the clipped reference distribution P and its
    int8 re-quantization Q; returns the threshold minimizing KL.
    """
    samples = np.abs(np.asarray(samples, np.float64).reshape(-1))
    amax = float(samples.max()) if samples.size else 0.0
    if amax == 0.0:
        return 1e-8
    hist, edges = np.histogram(samples, bins=num_bins, range=(0, amax))
    hist = hist.astype(np.float64)
    best_kl = np.inf
    best_i = num_bins
    for i in range(target_bins, num_bins + 1, 8):
        p = hist[:i].copy()
        p[-1] += hist[i:].sum()  # clipped outlier mass -> last bin of P
        if p.sum() == 0:
            continue
        # Q: the int8 projection of the *unclipped* section — quantize
        # hist[:i] into target_bins buckets, expand back over p's support.
        # (Building Q from the outlier-augmented P makes KL(P||Q)=0 at
        # every i and the search degenerates to the smallest threshold.)
        chunks = np.array_split(hist[:i], target_bins)
        q = np.concatenate([
            np.full(len(c), c.sum() / max((c > 0).sum(), 1))
            * (c > 0) for c in chunks])
        p_n = p / p.sum()
        q_n = q / max(q.sum(), 1e-30)
        mask = p_n > 0
        kl = float(np.sum(p_n[mask] *
                          np.log(p_n[mask] / np.maximum(q_n[mask], 1e-30))))
        if kl < best_kl:
            best_kl = kl
            best_i = i
    return float(edges[best_i])


def amax_threshold(samples: np.ndarray, percentile: float = 100.0) -> float:
    samples = np.abs(np.asarray(samples).reshape(-1))
    if samples.size == 0:
        return 1e-8
    if percentile >= 100.0:
        return float(samples.max())
    return float(np.percentile(samples, percentile))


class CalibrationCollector:
    """Accumulates per-tensor activation samples across calibration
    batches, then yields scales (the calibrator's getBatch loop).

    Methods: ``"entropy"`` (TRT's KL calibration — best on *trained*
    nets whose activations have heavy-tailed informative outliers),
    ``"percentile"`` (clip at a high |x| percentile — the robust default
    for untrained/random-weight nets, where entropy calibration picks
    degenerate thresholds), ``"max"`` (no clipping).
    """

    def __init__(self, method: str = "entropy", max_samples: int = 1 << 20,
                 percentile: float = 99.99):
        if method not in ("entropy", "percentile", "max"):
            raise ValueError(f"unknown calibration method {method!r}; "
                             "expected 'entropy', 'percentile', or 'max'")
        self.method = method
        self.max_samples = max_samples
        self.percentile = percentile
        self._samples: Dict[str, List[np.ndarray]] = {}

    def observe(self, name: str, x) -> None:
        arr = np.abs(np.asarray(x, np.float32).reshape(-1))
        if arr.size > 65536:  # subsample large activations
            arr = arr[:: arr.size // 65536 + 1]
        self._samples.setdefault(name, []).append(arr)

    def scales(self) -> Dict[str, float]:
        out = {}
        for name, chunks in self._samples.items():
            data = np.concatenate(chunks)
            if self.method == "entropy":
                t = entropy_threshold(data)
            elif self.method == "percentile":
                t = amax_threshold(data, self.percentile)
            else:  # "max"
                t = amax_threshold(data)
            out[name] = max(t, 1e-8) / 127.0
        return out


# --------------------------------------------------------------- weights


def quantize_per_channel(w: np.ndarray, axis: int = -1
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-channel int8: returns (int8 values, fp32 scales)."""
    w = np.asarray(w, np.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis % w.ndim)
    amax = np.abs(w).max(axis=reduce_axes, keepdims=True)
    scale = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def dequantize(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    return q.astype(np.float32) * scale


# ------------------------------------------------------------- execution


def conv2d_int8(x_q, w_q, *, x_scale, w_scale, bias=None, strides=(1, 1),
                padding="SAME", out_dtype=jnp.float32):
    """int8 activations x int8 weights -> int32 accumulate -> dequant.

    ``x_q`` (N,H,W,C) int8, ``w_q`` HWIO int8, ``w_scale`` (1,1,1,K).
    """
    from redtail_tpu.ops.convolution import _resolve_padding

    pads = _resolve_padding(x_q.shape[1:3], w_q.shape[:2], strides, padding)
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, tuple(strides), pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (x_scale * w_scale.reshape(1, 1, 1, -1))
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


def quantize_act(x, scale):
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8)


def conv2d_w8(x, w_q, w_scale, bias=None, *, strides=(1, 1),
              padding="SAME"):
    """Weight-only int8 conv: weights dequantize on the fly (XLA folds the
    multiply into the conv constant); activations stay bf16/fp32."""
    w = w_q.astype(x.dtype) * w_scale.astype(x.dtype)
    from redtail_tpu.ops.convolution import conv2d
    return conv2d(x, w, bias, strides=strides, padding=padding)


def quantize_stereo_params_w8(params) -> Dict:
    """Weight-only quantization of a stereo param tree: each conv weight
    becomes {'weights_q', 'w_scale', 'biases'} with per-K scales."""
    def q(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict) and "weights" in v:
                wq, sc = quantize_per_channel(np.asarray(v["weights"]),
                                              axis=-1)
                out[k] = {"weights_q": jnp.asarray(wq),
                          "w_scale": jnp.asarray(sc),
                          "biases": v["biases"]}
            elif isinstance(v, dict):
                out[k] = q(v)
            else:
                out[k] = v
        return out
    return q(params)


def dequantize_tree(params, dtype=None) -> Dict:
    """Inverse of `quantize_stereo_params_w8`: every
    {'weights_q', 'w_scale'} leaf becomes a float 'weights' leaf again
    (optionally cast to ``dtype``).  The single walker shared by the
    serving node and the CLI so the quantized-leaf schema has one
    consumer to keep in sync."""
    def dq(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict) and "weights_q" in v:
                w = jnp.asarray(dequantize(np.asarray(v["weights_q"]),
                                           np.asarray(v["w_scale"])))
                if dtype is not None:
                    w = w.astype(dtype)
                out[k] = {"weights": w, "biases": v["biases"]}
            elif isinstance(v, dict):
                out[k] = dq(v)
            else:
                out[k] = v
        return out
    return dq(params)


# ------------------------------------------------ Caffe-graph INT8 path


def calibrate_caffe_net(net, frames, *, method: str = "entropy",
                        percentile: float = 99.99) -> Dict[str, float]:
    """Run calibration frames through a `CaffeNet`, collecting input-
    activation scales for every Convolution/InnerProduct layer.

    Use ``method="percentile"`` for untrained/random-weight nets (see
    `CalibrationCollector`); ``"entropy"`` matches the reference's
    `Int8EntropyCalibrator` and is right for trained models.
    """
    collector = CalibrationCollector(method=method, percentile=percentile)
    conv_layers = [(l.get("name"), l.get_all("bottom")[0])
                   for l in net.layers
                   if l.get("type") in ("Convolution", "InnerProduct")]
    for frame in frames:
        blobs = net.forward(frame)
        for name, bottom in conv_layers:
            collector.observe(name, blobs[bottom])
    return collector.scales()


def caffe_net_forward_int8(net, inputs, act_scales: Dict[str, float],
                           *, return_blobs: bool = False):
    """Execute a `CaffeNet` with int8 convolutions.

    Convolution layers whose input scale was calibrated run as
    int8 x int8 -> int32; everything else stays fp32. Returns the final
    blob like ``net.__call__`` (or every blob with ``return_blobs``).
    """
    import math

    from redtail_tpu.io.caffe import Msg
    from redtail_tpu.models.caffe_net import _as_pair

    params = net.params
    if not isinstance(inputs, dict):
        inputs = {net.input_names[0]: inputs}
    blobs: Dict[str, jnp.ndarray] = {}
    for name, shape in zip(net.input_names, net.input_shapes):
        x = jnp.asarray(inputs[name], net.dtype)
        if x.ndim == 3:
            x = x[None]
        if x.shape[1] == shape[1] and x.shape[3] != shape[1]:
            x = jnp.transpose(x, (0, 2, 3, 1))
        blobs[name] = x
    last_top = None
    for l in net.layers:
        t = l.get("type")
        name = l.get("name")
        bottoms = [blobs[b] for b in l.get_all("bottom")]
        if t == "Convolution" and name in act_scales:
            p = l.get("convolution_param")
            kh, kw = _as_pair(p, "kernel_size")
            sh, sw = _as_pair(p, "stride") or (1, 1)
            ph, pw = _as_pair(p, "pad") or (0, 0)
            w = np.asarray(params[name][0])
            w = np.transpose(w.reshape(w.shape[0], -1, kh, kw), (2, 3, 1, 0))
            wq, wsc = quantize_per_channel(w, axis=-1)
            x = bottoms[0]
            xs = act_scales[name]
            out = conv2d_int8(
                quantize_act(x, xs), jnp.asarray(wq),
                x_scale=xs, w_scale=jnp.asarray(wsc.reshape(-1)),
                bias=(params[name][1] if len(params[name]) > 1 else None),
                strides=(sh, sw), padding=[(ph, ph), (pw, pw)],
                out_dtype=net.dtype)
        else:
            out = net._apply(t, name, l, bottoms, params)
        for top in l.get_all("top"):
            blobs[top] = out
            last_top = top
    return blobs if return_blobs else blobs[last_top]


# ------------------------------------------------------ calibration cache


def save_calibration(scales: Dict[str, float], path) -> None:
    """Persist calibration scales — the reference's INT8 calibration cache
    (`int8_calibrator.cpp:82-110` writeCalibrationCache) as JSON."""
    import json
    from pathlib import Path

    Path(path).write_text(json.dumps(scales, indent=2, sort_keys=True))


def load_calibration(path) -> Dict[str, float]:
    import json
    from pathlib import Path

    return {k: float(v) for k, v in
            json.loads(Path(path).read_text()).items()}


def calibrate_or_load(net, frames, cache_path, *, method: str = "entropy",
                      percentile: float = 99.99) -> Dict[str, float]:
    """Load cached scales if present, else calibrate and write the cache
    (the reference node's readCalibrationCache-or-run-batches flow)."""
    from pathlib import Path

    cache = Path(cache_path)
    if cache.exists():
        return load_calibration(cache)
    scales = calibrate_caffe_net(net, frames, method=method,
                                 percentile=percentile)
    save_calibration(scales, cache)
    return scales
