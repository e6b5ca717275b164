"""INT8-activation serving for the stereo model zoo.

The reference's INT8 ladder (`tensor_net.cpp:92-119` mode selection +
`Int8EntropyCalibrator`) applied to the stereo nets: the 2D conv stacks
(siamese encoder and, for ResNet18-2D, the bottleneck encoder) run as
int8 x int8 -> int32 on the MXU with per-channel weight scales and
per-layer calibrated activation scales; everything else (cost volume,
soft-argmax, 3D convs, transposed convs) stays bf16/fp32.

Usage:
    scales = calibrate_stereo(spec, params, frames)       # (leaf path -> scale)
    qparams = quantize_stereo_params_int8(params, scales)
    disp = stereo_forward(spec, qparams, left, right)     # same forward

Accuracy (measured r3, `stereo_app --accuracy`, sample pair vs the
reference-TF golden): concat-volume models quantize fully (NVTiny D1
0.09%). The CORRELATION model's bottleneck is excluded by
`int8_prefixes` — its input concat(conv1 features, disparity in [0,1])
cannot share one per-tensor scale (bneck int8 measured 73.8% D1;
siamese-only 0.90% D1 / 0.30 px EPE). int8 activations are also SLOWER
than bf16 on TPU (r2 measurement) — this mode exists for the
reference's INT8-ladder parity and model-size work, not latency;
weight-only 'w8' is the recommended size rung (D1 <= 0.02%).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from redtail_tpu.quant.ptq import CalibrationCollector, quantize_per_channel

# Leaves under these roots run int8; transposed-conv decoders and the 3D
# stack stay in the float path.
INT8_PREFIXES = ("encoder2D", "bneck_encoder2D")


def int8_prefixes(spec) -> Tuple[str, ...]:
    """Which conv stacks run int8 for this model.

    Correlation models (resnet18_2d) quantize ONLY the siamese encoder:
    the bottleneck's input is concat(conv1 features, disparity in [0,1])
    — one per-tensor activation scale across those mixed magnitudes
    crushes the disparity channel to a few levels and destroys accuracy
    (measured on the sample pair: bneck int8 -> 73.8% D1; siamese-only
    -> 0.90% D1 / 0.30 px EPE). The concat-volume models keep both
    prefixes (NVTiny full int8: 0.09% D1)."""
    return ("encoder2D",) if getattr(spec, "corr", False) else INT8_PREFIXES


def _walk_conv_leaves(params, prefix=""):
    for k, v in params.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            if "weights" in v and np.asarray(v["weights"]).ndim == 4:
                yield path, v
            else:
                yield from _walk_conv_leaves(v, path)


def calibrate_stereo(spec, params, frames: Sequence[Tuple[np.ndarray,
                                                          np.ndarray]],
                     *, method: str = "percentile",
                     percentile: float = 99.99) -> Dict[str, float]:
    """Collect per-conv-layer input-activation scales.

    ``frames``: (left, right) pairs, NHWC float in [0, 1] (the model's
    input contract). Runs the real forward eagerly with the `_c2d` tap —
    no second forward implementation to drift. Default method is
    ``percentile`` (the documented choice for untrained nets; pass
    ``"entropy"`` for trained weights, matching the reference
    calibrator).
    """
    import jax

    from redtail_tpu.models import stereo as S

    id_to_path = {id(leaf): path
                  for path, leaf in _walk_conv_leaves(params)
                  if path.startswith(int8_prefixes(spec))}
    collector = CalibrationCollector(method=method, percentile=percentile)

    # One jitted "calibration forward" that returns every tapped conv
    # input: the tap records tracers while stereo_forward is traced
    # (params enter via closure so leaf identities survive), so the whole
    # collection runs as a single compiled program instead of eagerly op
    # by op — ~100x faster over a remote-device tunnel.
    def calib_fwd(l, r):
        recorded = {}

        def tap(leaf, x):
            path = id_to_path.get(id(leaf))
            if path is not None:
                # siamese towers share leaves: both towers' inputs count.
                # Subsample ON DEVICE (strided |x|, <=64Ki elements): the
                # collector subsamples identically, and shipping full
                # activations over a remote-device tunnel dominated
                # calibration time otherwise.
                flat = jnp.abs(x).reshape(-1)
                stride = max(1, flat.size // 65536)
                recorded.setdefault(path, []).append(flat[::stride][:65536])

        S._conv_tap = tap
        try:
            S.stereo_forward(spec, params, l, r)
        finally:
            S._conv_tap = None
        return recorded

    calib_fwd = jax.jit(calib_fwd)
    # inputs must match the params' compute dtype (e.g. bf16 serving)
    any_leaf = next(iter(_walk_conv_leaves(params)))[1]
    in_dtype = jnp.asarray(any_leaf["weights"]).dtype
    for left, right in frames:
        l = jnp.asarray(left, in_dtype)
        r = jnp.asarray(right, in_dtype)
        if l.ndim == 3:
            l, r = l[None], r[None]
        for path, acts in calib_fwd(l, r).items():
            for act in acts:
                collector.observe(path, act)
    return collector.scales()


def quantize_stereo_params_int8(params, act_scales: Dict[str, float]):
    """Replace calibrated 2D conv leaves with int8 leaves
    ({weights_q, w_scale, x_scale, biases}); everything else unchanged.
    """
    def q(node, prefix=""):
        out = {}
        for k, v in node.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict) and "weights" in v and path in act_scales:
                wq, sc = quantize_per_channel(np.asarray(v["weights"],
                                                         np.float32), axis=-1)
                out[k] = {"weights_q": jnp.asarray(wq),
                          "w_scale": jnp.asarray(sc.reshape(-1)),
                          "x_scale": jnp.float32(act_scales[path]),
                          "biases": v["biases"]}
            elif isinstance(v, dict):
                out[k] = q(v, path)
            else:
                out[k] = v
        return out
    return q(params)


def int8_layer_paths(params, spec=None) -> List[str]:
    """Conv-leaf paths that run int8 (pass ``spec`` to apply the
    per-model prefix policy — see `int8_prefixes`)."""
    prefixes = INT8_PREFIXES if spec is None else int8_prefixes(spec)
    return [p for p, _ in _walk_conv_leaves(params)
            if p.startswith(prefixes)]
