"""INT8 PTQ tests: entropy calibration, per-channel weight quantization,
int8 conv execution, and the full TrailNet INT8 path gated at the
reference's tolerance (0.1, `caffe_ros/tests/tests.cpp:337`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from redtail_tpu.quant import (
    CalibrationCollector,
    calibrate_caffe_net,
    entropy_threshold,
    quantize_per_channel,
    quantize_stereo_params_w8,
)
from redtail_tpu.quant.ptq import (
    amax_threshold,
    caffe_net_forward_int8,
    conv2d_int8,
    conv2d_w8,
    dequantize,
    quantize_act,
)

from conftest import REFERENCE, requires_reference


def test_entropy_threshold_clips_outliers(rng):
    # gaussian bulk + a few huge outliers: entropy threshold should land
    # far below the max, close to the bulk.
    data = np.concatenate([rng.randn(100_000), [500.0, -400.0]])
    t = entropy_threshold(data)
    assert 2.0 < t < 50.0
    assert amax_threshold(data) == pytest.approx(500.0)


def test_entropy_threshold_degenerate():
    assert entropy_threshold(np.zeros(100)) > 0


def test_per_channel_quantization_roundtrip(rng):
    w = rng.randn(3, 3, 16, 32).astype(np.float32)
    w[..., 5] *= 100.0  # one hot channel must not wreck the others
    q, scale = quantize_per_channel(w, axis=-1)
    assert q.dtype == np.int8
    back = dequantize(q, scale)
    rel = np.abs(back - w).max() / np.abs(w).max()
    assert rel < 0.01
    # per-channel: the cold channels keep fine resolution
    cold_err = np.abs(back[..., 0] - w[..., 0]).max()
    assert cold_err < np.abs(w[..., 0]).max() / 100


def test_conv2d_int8_matches_fp32(rng):
    from redtail_tpu.ops import conv2d

    x = rng.randn(1, 16, 16, 8).astype(np.float32)
    w = rng.randn(3, 3, 8, 16).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    want = np.asarray(conv2d(x, w, b))
    wq, wsc = quantize_per_channel(w, axis=-1)
    xs = np.abs(x).max() / 127.0
    got = np.asarray(conv2d_int8(
        quantize_act(jnp.asarray(x), xs), jnp.asarray(wq), x_scale=xs,
        w_scale=jnp.asarray(wsc.reshape(-1)), bias=jnp.asarray(b)))
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 0.05


def test_conv2d_w8_close_to_fp32(rng):
    from redtail_tpu.ops import conv2d

    x = rng.randn(1, 16, 16, 8).astype(np.float32)
    w = rng.randn(3, 3, 8, 16).astype(np.float32)
    want = np.asarray(conv2d(x, w))
    wq, wsc = quantize_per_channel(w, axis=-1)
    got = np.asarray(conv2d_w8(jnp.asarray(x), jnp.asarray(wq),
                               jnp.asarray(wsc)))
    assert np.abs(got - want).max() / np.abs(want).max() < 0.01


def test_quantize_stereo_params_tree():
    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    import dataclasses

    spec = dataclasses.replace(STEREO_SPECS["nvtiny"], input_hw=(32, 64),
                               max_disp=4)
    params = init_stereo_params(spec)
    qp = quantize_stereo_params_w8(params)
    leaf = qp["encoder2D"]["conv1"]
    assert leaf["weights_q"].dtype == jnp.int8
    assert leaf["w_scale"].shape[-1] == 32


@requires_reference
def test_trailnet_int8_feature_agreement():
    """FP32 vs INT8 TrailNet through the Caffe graph.

    The reference gated trained-model probabilities at 0.1
    (`tests.cpp:337`); with the caffemodel missing upstream this test runs
    random weights, where a deep He-init stack saturates the softmax and
    makes probabilities meaninglessly sensitive — so the gate here is
    cosine agreement of the pre-softmax features (fc3 logits), which is
    what the 0.1 probability gate implies for a trained model."""
    from redtail_tpu.models.trailnet import load_trailnet

    net = load_trailnet(seed=7)
    rs = np.random.RandomState(0)
    frames = [rs.randint(0, 256, (180, 320, 3)).astype(np.float32)
              for _ in range(4)]
    want = np.asarray(net.forward(frames[3])["fc3"]).reshape(-1)

    def cos_for(method):
        scales = calibrate_caffe_net(net, frames[:3], method=method)
        assert len(scales) >= 20  # all convs + fcs calibrated
        blobs = caffe_net_forward_int8(net, frames[3], scales,
                                       return_blobs=True)
        assert np.asarray(blobs["out"]).shape == (1, 6)  # contract intact
        got = np.asarray(blobs["fc3"]).reshape(-1)
        return float(np.dot(got, want) /
                     (np.linalg.norm(got) * np.linalg.norm(want)))

    # max calibration: no clipping, so this isolates the int8 execution
    # path — must be near-exact even on a 20-conv random network.
    assert cos_for("max") > 0.995
    # entropy calibration clips; on random weights (near-Gaussian
    # activations with no real outliers) clipping costs accuracy that
    # trained networks recover — gate loosely, it exercises the KL path.
    assert cos_for("entropy") > 0.85
    # percentile calibration is the documented default for untrained
    # nets: barely clips a Gaussian, so it must track "max" closely.
    assert cos_for("percentile") > 0.99


@requires_reference
def test_stereo_w8_disparity_close_to_fp32():
    """Weight-only int8 stereo serving (StereoNode quantize='w8') on real
    NVTiny weights: disparity within the reference's FP16-class tolerance
    of the fp32 path."""
    import jax.numpy as jnp

    from redtail_tpu.models import STEREO_SPECS, load_stereo_params
    from redtail_tpu.runtime.nodes import StereoNode

    cv2 = pytest.importorskip("cv2")
    spec = STEREO_SPECS["nvtiny"]
    params = load_stereo_params(
        REFERENCE / "stereoDNN/models/NVTiny/TensorFlow/"
        "model-inference-513x161-0")
    # a REAL stereo pair: on noise inputs the cost distribution is flat
    # and soft-argmin amplifies any perturbation into many px.
    samples = REFERENCE / "stereoDNN/sample_app/data"
    frame_l = cv2.imread(str(samples / "img_left.png"))
    frame_r = cv2.imread(str(samples / "img_right.png"))
    fp32 = StereoNode(spec, params, dtype=jnp.float32)
    w8 = StereoNode(spec, params, dtype=jnp.float32, quantize="w8")
    d_fp = fp32(frame_l, frame_r)
    d_w8 = w8(frame_l, frame_r)
    diff = np.abs(d_fp - d_w8)
    # FP16-class agreement on well-posed inputs (48-px disparity range)
    assert diff.mean() < 0.1
    assert np.percentile(diff, 99) < 1.0


def test_stereo_int8_forward_small():
    """INT8-activation stereo path at toy shapes: the 2D conv stacks run
    int8 x int8 -> int32 through the SAME stereo_forward (leaf dispatch),
    and the output stays close to fp32 on random weights."""
    import dataclasses

    import jax.numpy as jnp

    from redtail_tpu.models import (STEREO_SPECS, init_stereo_params,
                                    stereo_forward)
    from redtail_tpu.quant.stereo_int8 import (
        calibrate_stereo, int8_layer_paths, quantize_stereo_params_int8)

    rs = np.random.RandomState(0)
    for model in ("nvtiny", "resnet18_2d"):
        spec = dataclasses.replace(STEREO_SPECS[model], input_hw=(32, 64),
                                   max_disp=4)
        params = init_stereo_params(spec)
        frames = [(rs.rand(32, 64, 3).astype(np.float32),
                   rs.rand(32, 64, 3).astype(np.float32)) for _ in range(2)]
        scales = calibrate_stereo(spec, params, frames)
        assert set(scales) == set(int8_layer_paths(params, spec))
        if spec.corr:
            # correlation models keep the bottleneck in bf16: its
            # concat(conv1, disparity) input can't share one per-tensor
            # scale (measured 73.8% D1 quantized vs 0.9% excluded)
            assert not any(p.startswith("bneck") for p in scales)
            assert any(p.startswith("encoder2D") for p in scales)
        qparams = quantize_stereo_params_int8(params, scales)
        l = jnp.asarray(frames[0][0])[None]
        r = jnp.asarray(frames[0][1])[None]
        d_fp = np.asarray(stereo_forward(spec, params, l, r))
        d_q = np.asarray(stereo_forward(spec, qparams, l, r))
        scale = 1.0 if spec.corr else spec.full_max_disp  # comparable units
        diff = np.abs(d_fp - d_q) / scale
        assert diff.mean() < 0.05, (model, diff.mean())


@requires_reference
def test_stereo_int8_disparity_close_to_fp32():
    """Full INT8-activation serving (StereoNode quantize='int8') on real
    NVTiny weights, calibrated on the real stereo pair: the reference
    gated INT8 nodes at 0.1 (`caffe_ros/tests/tests.cpp:337`); disparity
    equivalent here is ~1 px-scale agreement on a 48-px range."""
    import jax.numpy as jnp

    from redtail_tpu.models import STEREO_SPECS, load_stereo_params
    from redtail_tpu.runtime.nodes import StereoNode

    cv2 = pytest.importorskip("cv2")
    spec = STEREO_SPECS["nvtiny"]
    params = load_stereo_params(
        REFERENCE / "stereoDNN/models/NVTiny/TensorFlow/"
        "model-inference-513x161-0")
    samples = REFERENCE / "stereoDNN/sample_app/data"
    frame_l = cv2.imread(str(samples / "img_left.png"))
    frame_r = cv2.imread(str(samples / "img_right.png"))
    fp32 = StereoNode(spec, params, dtype=jnp.float32)
    i8 = StereoNode(spec, params, dtype=jnp.float32, quantize="int8",
                    calib_frames=[(frame_l, frame_r)])
    d_fp = fp32(frame_l, frame_r)
    d_i8 = i8(frame_l, frame_r)
    diff = np.abs(d_fp - d_i8)
    assert diff.mean() < 0.5
    assert np.percentile(diff, 99) < 3.0


def test_calibration_cache_roundtrip(tmp_path):
    from redtail_tpu.quant.ptq import load_calibration, save_calibration

    scales = {"conv1": 0.0123, "fc": 0.5}
    save_calibration(scales, tmp_path / "calib.json")
    assert load_calibration(tmp_path / "calib.json") == scales
