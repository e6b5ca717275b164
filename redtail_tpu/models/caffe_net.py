"""Caffe graph interpreter: execute a parsed prototxt as one XLA program.

TPU-native replacement for the reference's `TensorNet` engine path
(`ros/packages/caffe_ros/src/tensor_net.cpp:79-180`: NvCaffeParser ->
TensorRT engine). The layer set covers the two shipped inference graphs
(`models/pretrained/TrailNet_SResNet-18.prototxt`, `yolo-relu.prototxt`):
Convolution, Pooling (MAX/AVE with Caffe's ceil-mode arithmetic), ReLU,
Scale (learned or filler-constant, i.e. TrailNet's sub_mean and the
SReLU shift pair), BatchNorm (global stats), Eltwise, InnerProduct,
Softmax, Concat, Dropout (inference no-op).

Activations are NHWC internally (TPU lane dim = channels); Caffe's NCHW
conventions (weight layout OIHW, InnerProduct flattening order, channel
axis = 1) are honored at the boundaries.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from redtail_tpu.io.caffe import Msg


def _as_pair(param: Msg, base: str):
    """Caffe's kernel_size/stride/pad fields: scalar, repeated, or _h/_w.

    The anisotropic names drop any ``_size`` suffix (Caffe proto:
    ``kernel_size`` vs ``kernel_h``/``kernel_w``)."""
    stem = base[:-5] if base.endswith("_size") else base
    h = param.get(stem + "_h")
    w = param.get(stem + "_w")
    if h is not None or w is not None:
        return int(h), int(w)
    vals = param.get_all(base)
    if not vals:
        return None
    if len(vals) == 1:
        return int(vals[0]), int(vals[0])
    return int(vals[0]), int(vals[1])


class CaffeNet:
    """Executable network built from a parsed prototxt.

    ``net.params`` is the weight pytree (layer name -> list of arrays,
    Caffe blob order); pass it (or a trained/quantized variant) to
    ``net.forward``. Weights come from a caffemodel if given, else from the
    prototxt fillers (xavier/constant) for structural testing.
    """

    SUPPORTED = {"Convolution", "Pooling", "ReLU", "Scale", "BatchNorm",
                 "Eltwise", "InnerProduct", "Softmax", "Concat", "Dropout",
                 "Input", "Power"}

    def __init__(self, net: Msg, weights: Optional[Dict[str, List]] = None,
                 *, seed: int = 0, dtype=jnp.float32):
        self.net = net
        self.dtype = dtype
        self.layers = [l for l in net.get_all("layer")
                       if self._in_deploy(l)]
        for l in self.layers:
            t = l.get("type")
            if t not in self.SUPPORTED:
                raise NotImplementedError(f"Caffe layer type {t!r}")
        self.input_names, self.input_shapes = self._parse_inputs(net)
        self.params = self._init_params(weights, seed)

    @staticmethod
    def _in_deploy(layer: Msg) -> bool:
        # Skip train-phase-only layers (include.phase: TRAIN).
        for inc in layer.get_all("include"):
            if inc.get("phase") == "TRAIN":
                return False
        return True

    @staticmethod
    def _parse_inputs(net: Msg):
        names = [n for n in net.get_all("input")]
        shapes = []
        for shp in net.get_all("input_shape"):
            shapes.append([int(d) for d in shp.get_all("dim")])
        dims = net.get_all("input_dim")
        if dims:
            shapes = [[int(d) for d in dims[i:i + 4]]
                      for i in range(0, len(dims), 4)]
        return names, shapes  # shapes are NCHW

    # ------------------------------------------------------------ weights

    def _init_params(self, weights, seed):
        rng = np.random.RandomState(seed)
        params: Dict[str, List[jnp.ndarray]] = {}
        # Track channel counts through the graph to size random weights.
        chans: Dict[str, int] = {}
        for name, shape in zip(self.input_names, self.input_shapes):
            chans[name] = shape[1]
        for l in self.layers:
            t = l.get("type")
            name = l.get("name")
            bottoms = l.get_all("bottom")
            tops = l.get_all("top")
            cin = chans.get(bottoms[0]) if bottoms else None
            cout = cin
            blobs: List[np.ndarray] = []
            if t == "Convolution":
                p = l.get("convolution_param")
                cout = int(p.get("num_output"))
                kh, kw = _as_pair(p, "kernel_size")
                if weights and name in weights:
                    blobs = [np.asarray(b) for b in weights[name]]
                else:
                    fan_in = cin * kh * kw
                    blobs = [rng.randn(cout, cin, kh, kw).astype(np.float32)
                             * math.sqrt(2.0 / fan_in)]
                    if p.get("bias_term", True):
                        blobs.append(np.zeros(cout, np.float32))
            elif t == "InnerProduct":
                p = l.get("inner_product_param")
                cout = int(p.get("num_output"))
                if weights and name in weights:
                    blobs = [np.asarray(b) for b in weights[name]]
                else:
                    # fan-in resolved at first forward; defer via callable is
                    # overkill — store None and lazily init in forward.
                    blobs = [("lazy_ip", cout, seed)]
            elif t == "Scale":
                p = l.get("scale_param") or Msg()
                if weights and name in weights:
                    blobs = [np.asarray(b) for b in weights[name]]
                else:
                    filler = p.get("filler")
                    if filler is not None and "value" in filler:
                        blobs = [np.float32(filler.get("value"))]
                    else:
                        blobs = [np.ones(cin, np.float32)]
                    if p.get("bias_term", False):
                        bf = p.get("bias_filler")
                        if bf is not None and "value" in bf:
                            blobs.append(np.float32(bf.get("value")))
                        else:
                            blobs.append(np.zeros(cin, np.float32))
            elif t == "BatchNorm":
                if weights and name in weights:
                    blobs = [np.asarray(b) for b in weights[name]]
                else:
                    blobs = [np.zeros(cin, np.float32),
                             np.ones(cin, np.float32),
                             np.ones(1, np.float32)]
            elif t == "Concat":
                cout = sum(chans[b] for b in bottoms)
            elif t == "Eltwise":
                cout = chans[bottoms[0]]
            if blobs:
                params[name] = [jnp.asarray(b) if isinstance(b, np.ndarray)
                                else b for b in blobs]
            for top in tops:
                chans[top] = cout
        return params

    # ------------------------------------------------------------ forward

    def forward(self, inputs, params=None):
        """Run the graph. ``inputs``: array or dict name->array, NCHW or
        NHWC (NCHW is detected by C==input_shape C). Returns dict of all
        blob values (NHWC) plus '__out__' = last layer's top."""
        params = self.params if params is None else params
        if not isinstance(inputs, dict):
            inputs = {self.input_names[0]: inputs}
        blobs: Dict[str, jnp.ndarray] = {}
        for name, shape in zip(self.input_names, self.input_shapes):
            x = jnp.asarray(inputs[name], self.dtype)
            if x.ndim == 3:
                x = x[None]
            if x.shape[1] == shape[1] and x.shape[3] != shape[1]:
                x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
            blobs[name] = x
        last_top = None
        for l in self.layers:
            t = l.get("type")
            name = l.get("name")
            bottoms = [blobs[b] for b in l.get_all("bottom")]
            out = self._apply(t, name, l, bottoms, params)
            for top in l.get_all("top"):
                blobs[top] = out
                last_top = top
        blobs["__out__"] = blobs[last_top]
        return blobs

    def __call__(self, inputs, params=None):
        return self.forward(inputs, params)["__out__"]

    def _apply(self, t, name, l, bottoms, params):
        x = bottoms[0] if bottoms else None
        if t == "ReLU":
            slope = (l.get("relu_param") or Msg()).get("negative_slope", 0.0)
            return jnp.where(x > 0, x, slope * x) if slope else jnp.maximum(x, 0)
        if t == "Convolution":
            return self._conv(l, x, params[name])
        if t == "Pooling":
            return self._pool(l, x)
        if t == "Scale":
            return self._scale(l, x, params[name])
        if t == "BatchNorm":
            mean, var, sf = params[name][:3]
            eps = (l.get("batch_norm_param") or Msg()).get("eps", 1e-5)
            scale = 1.0 / jnp.maximum(sf.reshape(-1)[0], 1e-30)
            m = (mean * scale).astype(x.dtype)
            v = (var * scale).astype(x.dtype)
            return (x - m) * lax.rsqrt(v + eps)
        if t == "Eltwise":
            op = (l.get("eltwise_param") or Msg()).get("operation", "SUM")
            if op == "SUM":
                out = bottoms[0]
                for b in bottoms[1:]:
                    out = out + b
                return out
            if op == "PROD":
                out = bottoms[0]
                for b in bottoms[1:]:
                    out = out * b
                return out
            if op == "MAX":
                out = bottoms[0]
                for b in bottoms[1:]:
                    out = jnp.maximum(out, b)
                return out
            raise NotImplementedError(f"Eltwise {op}")
        if t == "InnerProduct":
            return self._inner_product(name, x, params)
        if t == "Softmax":
            axis = (l.get("softmax_param") or Msg()).get("axis", 1)
            # Caffe axis 1 = channels = our last axis for 4D, axis 1 for 2D.
            jax_axis = -1 if x.ndim in (2, 4) and axis == 1 else axis
            return jax.nn.softmax(x, axis=jax_axis)
        if t == "Concat":
            axis = (l.get("concat_param") or Msg()).get("axis", 1)
            jax_axis = 3 if (axis == 1 and bottoms[0].ndim == 4) else \
                (-1 if axis == 1 else axis)
            return jnp.concatenate(bottoms, axis=jax_axis)
        if t == "Dropout":
            return x
        if t == "Power":
            p = l.get("power_param") or Msg()
            power = p.get("power", 1.0)
            scale = p.get("scale", 1.0)
            shift = p.get("shift", 0.0)
            out = scale * x + shift
            return out if power == 1.0 else out ** power
        if t == "Input":
            return x
        raise NotImplementedError(t)

    def _conv(self, l, x, blobs):
        p = l.get("convolution_param")
        kh, kw = _as_pair(p, "kernel_size")
        sh, sw = _as_pair(p, "stride") or (1, 1)
        pad = _as_pair(p, "pad") or (0, 0)
        w = blobs[0]  # OIHW
        w = jnp.transpose(w.reshape(w.shape[0], -1, kh, kw), (2, 3, 1, 0))
        out = lax.conv_general_dilated(
            x, w.astype(x.dtype), (sh, sw),
            [(pad[0], pad[0]), (pad[1], pad[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            precision=(lax.Precision.HIGHEST
                       if x.dtype == jnp.float32 else None),
        )
        if len(blobs) > 1:
            out = out + blobs[1].astype(out.dtype)
        return out.astype(x.dtype)

    def _scale(self, l, x, blobs):
        """Scale layer: y = x * s (+ b). ``s``/``b`` are either learned
        per-channel blobs [C] (broadcast over NHWC channels-last) or the
        prototxt's constant fillers (TrailNet sub_mean: 1/256, -0.5; the
        SReLU shift-up/down pair)."""
        out = x * jnp.asarray(blobs[0], x.dtype)
        if len(blobs) > 1:
            out = out + jnp.asarray(blobs[1], x.dtype)
        return out

    def _pool(self, l, x):
        p = l.get("pooling_param")
        mode = p.get("pool", "MAX")
        if p.get("global_pooling", False):
            kh, kw = x.shape[1], x.shape[2]
            sh = sw = 1
            ph = pw = 0
        else:
            kh, kw = _as_pair(p, "kernel_size")
            sh, sw = _as_pair(p, "stride") or (1, 1)
            ph, pw = _as_pair(p, "pad") or (0, 0)
        h, w = x.shape[1], x.shape[2]

        def out_dim(size, k, s, pad):
            # Caffe ceil-mode with the clip rule: last window must start
            # strictly inside the (padded) input.
            o = int(math.ceil((size + 2 * pad - k) / s)) + 1
            if pad > 0 and (o - 1) * s >= size + pad:
                o -= 1
            return o

        oh, ow = out_dim(h, kh, sh, ph), out_dim(w, kw, sw, pw)
        hi_h = max(0, (oh - 1) * sh + kh - h - ph)
        hi_w = max(0, (ow - 1) * sw + kw - w - pw)
        if mode == "MAX":
            pad_val = -jnp.inf
            out = lax.reduce_window(
                x, pad_val, lax.max, (1, kh, kw, 1), (1, sh, sw, 1),
                [(0, 0), (ph, hi_h), (pw, hi_w), (0, 0)])
            return out
        # AVE: Caffe divides by the window size clipped to the *padded*
        # extent — padded zeros count, ceil-extra cells do not.
        sums = lax.reduce_window(
            x, 0.0, lax.add, (1, kh, kw, 1),
            (1, sh, sw, 1), [(0, 0), (ph, hi_h), (pw, hi_w), (0, 0)])
        ones = jnp.ones((1, h + 2 * ph, w + 2 * pw, 1), x.dtype)
        counts = lax.reduce_window(
            ones, 0.0, lax.add, (1, kh, kw, 1),
            (1, sh, sw, 1),
            [(0, 0), (0, max(0, hi_h - ph)), (0, max(0, hi_w - pw)), (0, 0)])
        return sums / counts

    def _inner_product(self, name, x, params):
        blobs = params[name]
        if isinstance(blobs[0], tuple) and blobs[0][0] == "lazy_ip":
            _tag, cout, seed = blobs[0]
            fan_in = int(np.prod(x.shape[1:]))
            import zlib
            # stable per-layer seed (Python's hash() is salted per process)
            rng = np.random.RandomState(seed ^ (zlib.crc32(name.encode())
                                                & 0xFFFF))
            w = rng.randn(cout, fan_in).astype(np.float32) \
                * math.sqrt(1.0 / fan_in)
            # store host arrays: this may run inside a jit trace, and
            # caching device arrays created there leaks tracers
            blobs = [w, np.zeros(cout, np.float32)]
            params[name] = blobs
        w = blobs[0]
        if w.ndim == 4:  # legacy (1, 1, out, in) blob shape
            w = w.reshape(w.shape[-2], w.shape[-1])
        if x.ndim == 4:
            x = jnp.transpose(x, (0, 3, 1, 2))  # Caffe flattens NCHW
        x = x.reshape(x.shape[0], -1)
        out = jnp.dot(x, w.astype(x.dtype).T,
                      preferred_element_type=jnp.float32)
        if len(blobs) > 1:
            out = out + blobs[1]
        return out.astype(self.dtype)
