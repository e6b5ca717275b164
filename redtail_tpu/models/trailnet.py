"""TrailNet SResNet-18: trail orientation + lateral-offset classifier.

Two implementations, cross-checked against each other in tests:

1. The Caffe-graph path: `load_trailnet()` executes the shipped prototxt
   (`models/pretrained/TrailNet_SResNet-18.prototxt`) through the
   `CaffeNet` interpreter — drop-in for the reference `caffe_ros` node
   (weights from a caffemodel when available; the upstream repo ships the
   prototxt but its caffemodel was not mirrored).
2. A native JAX builder mirroring the architecture (conv1+pool, 4x2
   residual blocks with shifted-ReLU, avg-pool, dual 3-way heads) for
   training and for serving without the interpreter.

Output contract (`caffe_ros.cpp:128-154`): 6 floats — softmax over
3 orientation classes (left/center/right of trail) concatenated with
softmax over 3 lateral-offset classes, as the `32FC6` row the controller
consumes (`px4_controller.cpp:351-381`).
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from redtail_tpu.io.caffe import load_prototxt
from redtail_tpu.models.caffe_net import CaffeNet
from redtail_tpu.ops.activations import srelu

DEFAULT_PROTOTXT = Path(
    "/root/reference/models/pretrained/TrailNet_SResNet-18.prototxt")

INPUT_HW = (180, 320)  # rows, cols (`TrailNet_SResNet-18.prototxt:1-7`)


def load_trailnet(prototxt_path=DEFAULT_PROTOTXT,
                  caffemodel_path=None, *, seed: int = 0,
                  dtype=jnp.float32) -> CaffeNet:
    """Build the TrailNet graph executor from the shipped prototxt."""
    weights = None
    if caffemodel_path is not None:
        from redtail_tpu.io.caffe import load_caffemodel
        weights = load_caffemodel(caffemodel_path)
    return CaffeNet(load_prototxt(prototxt_path), weights, seed=seed,
                    dtype=dtype)


def trailnet_predict(net: CaffeNet, image_bgr_255):
    """Full node path: raw 0-255 BGR HWC frame -> 6 probabilities.

    The graph's own sub_mean Scale layer applies the 1/256, -0.5
    normalization; input is the resized raw frame (the reference feeds
    scale=1 shift=0 by default, `caffe_ros.cpp:51-52`)."""
    x = jnp.asarray(image_bgr_255, net.dtype)
    if x.ndim == 3:
        x = x[None]
    out = net(x)
    return out  # (N, 6) — softmax ∥ softmax_t concat


# ----------------------------------------------------------- native model


_BLOCKS = (2, 2, 2, 2)
# Shipped SResNet-18 widths (`TrailNet_SResNet-18.prototxt`: conv1
# num_output 64, res1 64, res2 128, res3 256, res4 512).
_CHANNELS = (64, 128, 256, 512)


def init_trailnet_params(key=None, dtype=jnp.float32) -> Dict:
    """Random params for the native SResNet-18 (training entry point).

    The tree matches the shipped topology exactly (conv names =
    prototxt layer names), so a trained tree exports 1:1 into the
    reference's Caffe format via `trailnet_proto.native_params_to_blobs`.
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    def conv(key, kh, kw, cin, cout):
        fan_in = kh * kw * cin
        return {"w": jax.random.normal(key, (kh, kw, cin, cout), dtype)
                * math.sqrt(2.0 / fan_in),
                "b": jnp.zeros((cout,), dtype)}

    params: Dict = {}
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    params["conv1"] = conv(next(ki), 7, 7, 3, _CHANNELS[0])
    cin = _CHANNELS[0]
    for stage, (nblocks, cout) in enumerate(zip(_BLOCKS, _CHANNELS), 1):
        for blk in range(1, nblocks + 1):
            stride_block = stage > 1 and blk == 1
            params[f"res{stage}_{blk}_1"] = conv(next(ki), 3, 3, cin, cout)
            params[f"res{stage}_{blk}_2"] = conv(next(ki), 3, 3, cout, cout)
            if stride_block or cin != cout:
                params[f"res{stage}_{blk}_proj"] = conv(next(ki), 1, 1, cin,
                                                        cout)
            cin = cout
    # dual heads: fc3 (orientation), fc3_t (lateral offset)
    for head in ("fc3", "fc3_t"):
        k = next(ki)
        params[head] = {
            "w": jax.random.normal(k, (cin, 3), dtype) * math.sqrt(1.0 / cin),
            "b": jnp.zeros((3,), dtype)}
    return params


def trailnet_forward(params: Dict, x, *, return_logits: bool = False):
    """Native SResNet-18 forward: (N, 180, 320, 3) raw 0-255 -> (N, 6).

    ``return_logits``: emit the raw fc3/fc3_t logits (training path —
    softmax-of-logits loses gradient when the softmax saturates) instead
    of the serving contract's concatenated probabilities.

    Mirrors the shipped prototxt op for op: sub_mean (1/256, -0.5) ->
    conv1 7x7 s2 pad 0 -> maxpool 3x3 s2 (Caffe ceil mode) -> 4 stages of
    2 residual blocks with SReLU (the stride-2 sits on the SECOND conv of
    each stage's first block, with a 1x1 s2 projection shortcut — see
    res2_1_2/res2_1_proj in `TrailNet_SResNet-18.prototxt`) -> 10x6 AVE
    pool (global at 320x180, hardcoded by the reference's generator,
    `caffe_srelu_resnet.py:80-100`) -> fc3/fc3_t -> softmax each -> concat.
    """
    from jax import lax

    x = jnp.asarray(x)
    x = x * (1.0 / 256.0) - 0.5

    def c2d(p, x, stride=1, pad=None):
        # Caffe Convolution semantics: explicit symmetric pad (default 0),
        # floor output dims — NOT TF-SAME, whose asymmetric split shifts
        # boundary pixels for even-size/strided cases.
        kh, kw = p["w"].shape[:2]
        ph, pw = (pad, pad) if pad is not None else (kh // 2, kw // 2)
        out = lax.conv_general_dilated(
            x, p["w"], (stride, stride), [(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            precision=(lax.Precision.HIGHEST
                       if x.dtype == jnp.float32 else None))
        return (out + p["b"]).astype(x.dtype)

    def ceil_maxpool(x, k=3, s=2):
        # Caffe pooling rounds output dims UP; end-pad so reduce_window's
        # floor arithmetic lands on the same windows.
        h, w = x.shape[1], x.shape[2]
        eh = max(0, (math.ceil((h - k) / s)) * s + k - h)
        ew = max(0, (math.ceil((w - k) / s)) * s + k - w)
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                                 (1, s, s, 1),
                                 [(0, 0), (0, eh), (0, ew), (0, 0)])

    x = srelu(c2d(params["conv1"], x, 2, pad=0))
    x = ceil_maxpool(x)
    for stage, nblocks in enumerate(_BLOCKS, 1):
        for blk in range(1, nblocks + 1):
            stride = 2 if (stage > 1 and blk == 1) else 1
            res = srelu(c2d(params[f"res{stage}_{blk}_1"], x))
            res = c2d(params[f"res{stage}_{blk}_2"], res, stride)
            proj = params.get(f"res{stage}_{blk}_proj")
            shortcut = c2d(proj, x, stride, pad=0) if proj is not None else x
            x = srelu(res + shortcut)
    # pool_avg: kernel_w 10, kernel_h 6, stride 1 — exactly global at the
    # canonical input. Guard instead of silently diverging on other sizes.
    if x.shape[1:3] != (6, 10):
        raise ValueError(
            f"trailnet_forward: trunk output {x.shape[1:3]} != (6, 10); "
            f"the shipped 10x6 AVE pool requires {INPUT_HW} input "
            "(resize frames first)")
    x = jnp.mean(x, axis=(1, 2))
    outs = []
    for head in ("fc3", "fc3_t"):
        p = params[head]
        logits = jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]
        outs.append(logits if return_logits
                    else jax.nn.softmax(logits, axis=-1))
    if return_logits:
        return outs[0], outs[1]
    return jnp.concatenate(outs, axis=-1).astype(x.dtype)


# ----------------------------------------------------- weight artifacts


def params_to_w8_npz(params: Dict, path) -> None:
    """Save a native TrailNet tree as per-channel int8 weights + fp32
    scales/biases (halves the ~22 MB bf16 artifact; classification is
    insensitive to w8 — the same size rung the stereo zoo uses,
    `quant/ptq.py`). Layout: `<layer>/w_q` int8, `<layer>/w_scale` fp32
    (c_out,), `<layer>/b` fp32."""
    from redtail_tpu.quant.ptq import quantize_per_channel

    flat = {}
    for name, node in params.items():
        w = np.asarray(jax.device_get(node["w"]), np.float32)
        wq, scale = quantize_per_channel(w, axis=-1)
        flat[f"{name}/w_q"] = wq
        # quantize_per_channel returns keepdims scales; flatten so the
        # artifact layout matches the documented (c_out,) contract (the
        # load-path multiply broadcasts over the trailing channel axis
        # either way, but external consumers read the documented shape)
        flat[f"{name}/w_scale"] = np.asarray(scale, np.float32).reshape(-1)
        flat[f"{name}/b"] = np.asarray(jax.device_get(node["b"]),
                                       np.float32)
    np.savez(path, **flat)


def params_from_w8_npz(path, dtype=jnp.float32) -> Dict:
    """Load a `params_to_w8_npz` artifact back into a serving tree."""
    params: Dict = {}
    with np.load(path) as data:
        names = sorted({k.rsplit("/", 1)[0] for k in data.files})
        for name in names:
            w = (data[f"{name}/w_q"].astype(np.float32)
                 * data[f"{name}/w_scale"])
            params[name] = {"w": jnp.asarray(w, dtype),
                            "b": jnp.asarray(data[f"{name}/b"], dtype)}
    return params
