"""TrailNet prototxt emitter — the net-generator role of
`models/nets/ResNet/caffe_srelu_resnet.py` (which emitted the SResNet-18
deploy prototxt the Caffe/DIGITS rig trained).

Emits a Caffe deploy prototxt + blob dict for the **native** SResNet-18
(`models/trailnet.py`), so trained JAX weights can be exported to the
Caffe toolchain format — and, round-tripped through our own `CaffeNet`
interpreter, must reproduce the native forward exactly (tested).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from redtail_tpu.models.trailnet import _BLOCKS, _CHANNELS, INPUT_HW


def _conv_layer(name, bottom, top, num_output, kernel, stride=1, pad=None):
    pad = kernel // 2 if pad is None else pad
    return f"""layer {{
  name: "{name}"
  type: "Convolution"
  bottom: "{bottom}"
  top: "{top}"
  convolution_param {{ num_output: {num_output} kernel_size: {kernel} \
stride: {stride} pad: {pad} }}
}}
"""


def _srelu_layers(name, bottom, top):
    return f"""layer {{
  name: "{name}_srelu_1"
  type: "Scale"
  bottom: "{bottom}"
  top: "{top}"
  scale_param {{ filler {{ value: 1.0 }} bias_term: true \
bias_filler {{ value: 1.0 }} }}
}}
layer {{
  name: "{name}_srelu_2"
  type: "ReLU"
  bottom: "{top}"
  top: "{top}"
}}
layer {{
  name: "{name}_srelu_3"
  type: "Scale"
  bottom: "{top}"
  top: "{top}"
  scale_param {{ filler {{ value: 1.0 }} bias_term: true \
bias_filler {{ value: -1.0 }} }}
}}
"""


def emit_trailnet_prototxt() -> str:
    h, w = INPUT_HW
    out: List[str] = [f"""input: "data"
input_shape {{ dim: 1 dim: 3 dim: {h} dim: {w} }}
layer {{
  name: "sub_mean"
  type: "Scale"
  bottom: "data"
  top: "sub_mean"
  scale_param {{ filler {{ value: 0.00390625 }} bias_term: true \
bias_filler {{ value: -0.5 }} }}
}}
"""]
    out.append(_conv_layer("conv1", "sub_mean", "conv1", _CHANNELS[0], 7, 2))
    out.append(_srelu_layers("conv1", "conv1", "conv1_act"))
    out.append("""layer {
  name: "pool1"
  type: "Pooling"
  bottom: "conv1_act"
  top: "pool1"
  pooling_param { pool: MAX kernel_size: 3 stride: 2 }
}
""")
    bottom = "pool1"
    cin = _CHANNELS[0]
    for stage, (nblocks, cout) in enumerate(zip(_BLOCKS, _CHANNELS), 1):
        for blk in range(1, nblocks + 1):
            stride = 2 if (stage > 1 and blk == 1) else 1
            base = f"res{stage}_{blk}"
            out.append(_conv_layer(f"{base}_1", bottom, f"{base}_1", cout,
                                   3, stride))
            out.append(_srelu_layers(f"{base}_1", f"{base}_1",
                                     f"{base}_1_act"))
            out.append(_conv_layer(f"{base}_2", f"{base}_1_act",
                                   f"{base}_2", cout, 3, 1))
            shortcut = bottom
            if stride != 1 or cin != cout:
                out.append(_conv_layer(f"{base}_proj", bottom,
                                       f"{base}_proj", cout, 1, stride,
                                       pad=0))
                shortcut = f"{base}_proj"
            out.append(f"""layer {{
  name: "{base}_sum"
  type: "Eltwise"
  bottom: "{base}_2"
  bottom: "{shortcut}"
  top: "{base}_sum"
}}
""")
            out.append(_srelu_layers(base, f"{base}_sum", f"{base}_act"))
            bottom = f"{base}_act"
            cin = cout
    out.append(f"""layer {{
  name: "pool_avg"
  type: "Pooling"
  bottom: "{bottom}"
  top: "pool_avg"
  pooling_param {{ pool: AVE global_pooling: true kernel_size: 1 }}
}}
""")
    for head, top_sm in (("fc3", "softmax"), ("fc3_t", "softmax_t")):
        out.append(f"""layer {{
  name: "{head}"
  type: "InnerProduct"
  bottom: "pool_avg"
  top: "{head}"
  inner_product_param {{ num_output: 3 }}
}}
layer {{
  name: "{top_sm}"
  type: "Softmax"
  bottom: "{head}"
  top: "{top_sm}"
}}
""")
    out.append("""layer {
  name: "out"
  type: "Concat"
  bottom: "softmax"
  bottom: "softmax_t"
  top: "out"
}
""")
    return "".join(out)


def native_params_to_blobs(params: Dict) -> Dict[str, List[np.ndarray]]:
    """Native JAX param tree -> Caffe blob dict for the emitted prototxt.

    Conv weights HWIO -> OIHW; fc weights (in, out) -> (out, in) (the
    fc input is the pooled (N, C, 1, 1) blob, so NCHW flattening order
    matches the channel order directly)."""
    blobs: Dict[str, List[np.ndarray]] = {}
    for name, leaf in params.items():
        w = np.asarray(leaf["w"], np.float32)
        b = np.asarray(leaf["b"], np.float32)
        if w.ndim == 4:  # conv
            blobs[name] = [np.transpose(w, (3, 2, 0, 1)), b]
        else:            # fc (in, out)
            blobs[name] = [np.transpose(w, (1, 0)), b]
    return blobs
