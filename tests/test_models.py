"""Model-zoo tests.

End-to-end parity for the two models whose checkpoints shipped complete
(NVTiny, ResNet18-2D): golden disparities in `tests/data/*.npy` were
produced by running the reference's own TF inference graphs
(`stereoDNN/models/*/TensorFlow/*.meta` + checkpoint) on the shipped sample
stereo pair — see `tools/make_golden_e2e.py`. NVSmall / ResNet-18 3D
(checkpoint data files missing upstream) get structural tests with random
weights at reduced size, plus weight-blob load checks for NVSmall's
surviving fp16 TRT blob.
"""

import dataclasses
from pathlib import Path

import numpy as np
import pytest

import jax

from redtail_tpu.io import read_trt_weights
from redtail_tpu.models import (
    STEREO_SPECS,
    init_stereo_params,
    load_stereo_params,
    params_from_trt_blob,
    stereo_forward,
)

from conftest import REFERENCE, requires_reference

DATA = Path(__file__).parent / "data"
SAMPLES = REFERENCE / "stereoDNN/sample_app/data"
NVTINY_CKPT = (REFERENCE / "stereoDNN/models/NVTiny/TensorFlow/"
               "model-inference-513x161-0")
R2D_CKPT = (REFERENCE / "stereoDNN/models/ResNet-18_2D/TensorFlow/"
            "model-inference-513x257-0")


def load_pair(w, h):
    cv2 = pytest.importorskip("cv2")

    def load(p):
        img = cv2.imread(str(p))
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        return img[None]

    return load(SAMPLES / "img_left.png"), load(SAMPLES / "img_right.png")


@requires_reference
def test_nvtiny_end_to_end_parity():
    spec = STEREO_SPECS["nvtiny"]
    params = load_stereo_params(NVTINY_CKPT)
    h, w = spec.input_hw
    left, right = load_pair(w, h)
    disp = np.asarray(stereo_forward(spec, params, left, right))
    golden = np.load(DATA / "nvtiny_golden_disp.npy")[..., 0] * 513.0
    assert disp.shape == golden.shape
    # Same gate class as the reference's FP32 node tests (1e-3,
    # `caffe_ros/tests/tests.cpp:103`); disparity is in pixels.
    np.testing.assert_allclose(disp, golden, atol=1e-2)
    assert np.abs(disp - golden).mean() < 1e-4


@requires_reference
def test_nvtiny_trt_blob_same_output():
    """TRT-blob-loaded params must reproduce the checkpoint path exactly."""
    spec = STEREO_SPECS["nvtiny"]
    p_ckpt = load_stereo_params(NVTINY_CKPT)
    blob = read_trt_weights(
        REFERENCE / "stereoDNN/models/NVTiny/TensorRT/trt_weights.bin")
    p_blob = params_from_trt_blob(spec, blob)
    h, w = spec.input_hw
    left, right = load_pair(w, h)
    d1 = np.asarray(stereo_forward(spec, p_ckpt, left, right))
    d2 = np.asarray(stereo_forward(spec, p_blob, left, right))
    np.testing.assert_array_equal(d1, d2)


@requires_reference
def test_resnet18_2d_end_to_end_parity():
    spec = STEREO_SPECS["resnet18_2d"]
    params = load_stereo_params(R2D_CKPT)
    h, w = spec.input_hw
    left, right = load_pair(w, h)
    disp = np.asarray(stereo_forward(spec, params, left, right))
    golden = np.load(DATA / "resnet18_2d_golden_disp.npy")[..., 0]
    np.testing.assert_allclose(disp, golden, atol=1e-5)


@pytest.mark.parametrize("name,hw", [("resnet18_2d", (65, 129)),
                                     ("resnet18_2d", (64, 128)),
                                     ("nvtiny", (65, 129)),
                                     ("nvtiny", (64, 128))])
def test_s2d_packed_input_parity(name, hw, monkeypatch):
    """s2d-packed ingest inputs (conv1 as the folded 3x3 stride-1 form)
    must match the raw path, for both spatial parities (the TF-SAME pad
    parity flips the kernel remap), plain + resnet encoders, per-tower
    and block-diagonal fused towers.  Biases randomized (round-2
    lesson: zero init biases can hide boundary-row bugs)."""
    import jax.numpy as jnp

    from test_packed3d import _randomize_biases

    from redtail_tpu.ops.space_to_depth import space_to_depth2

    spec = dataclasses.replace(STEREO_SPECS[name], input_hw=hw, max_disp=8)
    params = _randomize_biases(init_stereo_params(spec, jax.random.PRNGKey(0)))
    h, w = hw
    rs = np.random.RandomState(2)
    left = rs.rand(1, h, w, 3).astype(np.float32)
    right = rs.rand(1, h, w, 3).astype(np.float32)
    pl = space_to_depth2(jnp.asarray(left))
    pr = space_to_depth2(jnp.asarray(right))
    modes = ("0", "1", "hp", "hpc") if name == "resnet18_2d" else ("0",)
    for fused in modes:
        # "hp": fused towers + H-packed resblocks (the TPU serving
        # configuration for the flagship, ops/packed2d.py); "hpc" adds
        # the opt-in packed correlation head (measured slower composed
        # but kept exactness-gated).
        hp = fused in ("hp", "hpc")
        monkeypatch.setenv("REDTAIL_TPU_FUSED_TOWERS",
                           "1" if hp else fused)
        monkeypatch.setenv("REDTAIL_TPU_HPACK2D", "1" if hp else "0")
        monkeypatch.setenv("REDTAIL_TPU_HPACK_CORR",
                           "1" if fused == "hpc" else "0")
        want = np.asarray(stereo_forward(spec, params, left, right))
        got = np.asarray(stereo_forward(spec, params, pl, pr))
        # fp32 reassociation only (12x3x3 vs 3x5x5 contraction order),
        # amplified through 20+ layers + soft-argmax; 1e-3 in sigmoid
        # units is ~0.1 px at this width.
        np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("name", ["nvsmall", "resnet18"])
def test_structural_random_weights(name):
    """NVSmall / ResNet-18 3D: shipped checkpoints lack data files, so gate
    structure + shapes with random weights at reduced resolution."""
    spec = dataclasses.replace(STEREO_SPECS[name], input_hw=(65, 129),
                               max_disp=8)
    params = init_stereo_params(spec, jax.random.PRNGKey(0))
    h, w = spec.input_hw
    left = np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32)
    right = np.random.RandomState(1).rand(1, h, w, 3).astype(np.float32)
    disp = np.asarray(stereo_forward(spec, params, left, right))
    assert disp.shape == (1, h, w)
    assert np.isfinite(disp).all()
    # soft-argmin output lives in [0, full_max_disp)
    assert disp.min() >= 0.0 and disp.max() <= spec.full_max_disp


@requires_reference
def test_nvsmall_fp16_blob_loads():
    blob = read_trt_weights(
        REFERENCE / "stereoDNN/models/NVSmall/TensorRT/trt_weights_fp16.bin",
        dtype="fp16")
    params = params_from_trt_blob(STEREO_SPECS["nvsmall"], blob)
    assert params["encoder2D"]["conv1"]["weights"].shape == (5, 5, 3, 32)
    assert params["encoder3D"]["conv3D_8"]["weights"].shape == (3, 3, 3, 128, 128)
    assert params["decoder3D"]["deconv3D_3"]["weights"].shape == (3, 3, 3, 1, 32)


@requires_reference
def test_resnet18_fp16_blob_roundtrip_shapes():
    # ResNet-18 3D blob is missing upstream; validate the spec's shape table
    # against the (complete) ResNet18-2D checkpoint's shared encoder instead.
    from redtail_tpu.io.tf_checkpoint import read_index
    idx = read_index(R2D_CKPT)
    from redtail_tpu.models.stereo import _spec_layer_shapes
    shapes = dict((p, k) for p, k, _ in
                  _spec_layer_shapes(STEREO_SPECS["resnet18_2d"]))
    for name, entry in idx.items():
        key = name.replace("model/", "").replace("/weights", "")
        if name.endswith("/weights"):
            assert shapes[key] == entry.shape, (key, shapes[key], entry.shape)


# Full-resolution 3D-model parity: ~10+ min each on the CPU backend
# (conv3d chains at 1025x321). Verified passing; run with
# REDTAIL_RUN_SLOW=1 (kept out of the default suite for CI time).
import os

slow = pytest.mark.skipif(os.environ.get("REDTAIL_RUN_SLOW") != "1",
                          reason="slow full-res 3D parity (verified; "
                          "set REDTAIL_RUN_SLOW=1)")


def _params_from_npz_weights(npz) -> dict:
    """Rebuild the nested param tree from the weight arrays stored in a
    golden npz (keys 'model|path|to|weights')."""
    from redtail_tpu.models import params_from_npz

    return params_from_npz(npz)


@slow
@requires_reference
def test_nvsmall_end_to_end_parity_fp16_blob():
    """NVSmall at full 1025x321 with its surviving fp16 TRT weights.

    Golden produced by feeding those same weights into the reference's
    own TF graph (`tools/make_golden_e2e.py` §3d; the graph's output is
    disparity / 1025). Gates both the architecture and the fp16
    blob-loading path end-to-end."""
    spec = STEREO_SPECS["nvsmall"]
    golden_npz = np.load(DATA / "nvsmall_golden.npz")
    golden = golden_npz["disp"][..., 0] * 1025.0
    params = _params_from_npz_weights(golden_npz)
    h, w = spec.input_hw
    left, right = load_pair(w, h)
    disp = np.asarray(stereo_forward(spec, params, left, right))
    assert disp.shape == golden.shape
    np.testing.assert_allclose(disp, golden, atol=5e-2)
    assert np.abs(disp - golden).mean() < 1e-3

    # and the blob loader reproduces the stored weights bit-for-bit
    blob = read_trt_weights(
        REFERENCE / "stereoDNN/models/NVSmall/TensorRT/trt_weights_fp16.bin",
        dtype="fp16")
    p2 = params_from_trt_blob(spec, blob)
    np.testing.assert_array_equal(
        np.asarray(p2["encoder2D"]["conv1"]["weights"]),
        np.asarray(params["encoder2D"]["conv1"]["weights"]))


@slow
@requires_reference
def test_resnet18_3d_end_to_end_parity_random_weights():
    """ResNet-18 3D at full 1025x321: no upstream weights survive, so the
    gate runs deterministic random weights through the reference's own TF
    graph and through this implementation (structural numeric parity)."""
    spec = STEREO_SPECS["resnet18"]
    golden_npz = np.load(DATA / "resnet18_golden.npz")
    golden = golden_npz["disp"][..., 0] * 1025.0
    params = _params_from_npz_weights(golden_npz)
    h, w = spec.input_hw
    left, right = load_pair(w, h)
    disp = np.asarray(stereo_forward(spec, params, left, right))
    assert disp.shape == golden.shape
    np.testing.assert_allclose(disp, golden, atol=5e-2)
    assert np.abs(disp - golden).mean() < 1e-3
