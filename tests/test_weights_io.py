"""Weight I/O: TRT blob round-trip, TF bundle reader vs TensorFlow, and
cross-source consistency (TRT blob == TF checkpoint modulo layout)."""

import numpy as np
import pytest

from redtail_tpu.io import read_trt_weights, write_trt_weights
from redtail_tpu.io.tf_checkpoint import load_checkpoint, read_index

from conftest import REFERENCE, requires_reference

NVTINY_CKPT = (REFERENCE / "stereoDNN/models/NVTiny/TensorFlow/"
               "model-inference-513x161-0")
NVTINY_TRT = REFERENCE / "stereoDNN/models/NVTiny/TensorRT/trt_weights.bin"
R2D_CKPT = (REFERENCE / "stereoDNN/models/ResNet-18_2D/TensorFlow/"
            "model-inference-513x257-0")


def test_trt_blob_roundtrip(tmp_path, rng):
    weights = {
        "a_k": rng.randn(4, 3, 3, 3).astype(np.float32),
        "a_b": rng.randn(4).astype(np.float32),
        "longer/name_with_path": rng.randn(17).astype(np.float32),
    }
    path = tmp_path / "w.bin"
    write_trt_weights(weights, path)
    back = read_trt_weights(path)
    assert set(back) == set(weights)
    for k in weights:
        np.testing.assert_array_equal(back[k], weights[k].reshape(-1))


def test_trt_blob_roundtrip_fp16(tmp_path, rng):
    weights = {"w": rng.randn(64).astype(np.float32)}
    path = tmp_path / "w16.bin"
    write_trt_weights(weights, path, dtype="fp16")
    back = read_trt_weights(path, dtype="fp16")
    np.testing.assert_allclose(back["w"], weights["w"], atol=1e-2)


@requires_reference
def test_bundle_reader_vs_tensorflow():
    tf = pytest.importorskip("tensorflow")
    ours = load_checkpoint(NVTINY_CKPT)
    reader = tf.train.load_checkpoint(str(NVTINY_CKPT))
    tf_names = set(reader.get_variable_to_shape_map())
    assert set(ours) == tf_names
    for name in sorted(tf_names):
        theirs = reader.get_tensor(name)
        np.testing.assert_array_equal(ours[name], theirs)


@requires_reference
def test_bundle_index_shapes():
    idx = read_index(NVTINY_CKPT)
    assert idx["model/encoder2D/conv1/weights"].shape == (5, 5, 3, 32)
    assert idx["model/decoder3D/deconv3D_3/weights"].shape == (3, 3, 3, 1, 16)


@requires_reference
def test_trt_blob_matches_tf_checkpoint():
    """The shipped NVTiny TRT blob must equal the TF checkpoint after the
    layout conversion the reference converter applied
    (`tensorrt_model_builder.py`: RSCK->KCRS, VRSCK->KVCRS)."""
    blob = read_trt_weights(NVTINY_TRT)
    ckpt = load_checkpoint(NVTINY_CKPT)
    # 2D conv: left_conv1_k is KCRS of model/encoder2D/conv1/weights (RSCK).
    w = ckpt["model/encoder2D/conv1/weights"]
    np.testing.assert_array_equal(
        blob["left_conv1_k"], np.transpose(w, (3, 2, 0, 1)).reshape(-1))
    np.testing.assert_array_equal(
        blob["left_conv1_b"], ckpt["model/encoder2D/conv1/biases"])
    # left and right share weights (siamese).
    np.testing.assert_array_equal(blob["left_conv3_k"], blob["right_conv3_k"])
    # 3D conv: conv3D_1_k is KVCRS of VRSCK weights.
    w3 = ckpt["model/encoder3D/conv3D_1/weights"]
    np.testing.assert_array_equal(
        blob["conv3D_1_k"], np.transpose(w3, (4, 0, 3, 1, 2)).reshape(-1))


@requires_reference
def test_resnet18_2d_checkpoint_loads():
    ckpt = load_checkpoint(R2D_CKPT)
    assert any("resblock" in k for k in ckpt)
    for name, arr in ckpt.items():
        assert arr.size > 0, name


@requires_reference
def test_convert_model_blob_roundtrip(tmp_path):
    """Conversion toolchain: checkpoint -> TRT blob must byte-match the
    reference's shipped NVTiny blob (same writer format + layouts as
    `tensorrt_model_builder.py`)."""
    import sys
    sys.path.insert(0, "tools")
    from convert_model import tree_to_blob

    from redtail_tpu.models import STEREO_SPECS, load_stereo_params

    params = load_stereo_params(NVTINY_CKPT)
    blob = tree_to_blob(STEREO_SPECS["nvtiny"], params)
    shipped = read_trt_weights(NVTINY_TRT)
    assert set(blob) == set(shipped)
    for name in shipped:
        np.testing.assert_array_equal(
            np.asarray(blob[name], np.float32).reshape(-1), shipped[name],
            err_msg=name)
    # and the writer emits a parseable file
    path = tmp_path / "w.bin"
    write_trt_weights(blob, path)
    back = read_trt_weights(path)
    assert set(back) == set(shipped)
