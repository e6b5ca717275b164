"""Config bridge, checkpointing, and camera-calibration tool tests."""

import argparse
import dataclasses

import numpy as np
import pytest

from redtail_tpu.control import ControllerConfig
from redtail_tpu.utils import (
    config_echo,
    config_from_args,
    load_params,
    save_params,
)
from redtail_tpu.utils.config import add_config_args


def test_config_cli_roundtrip():
    parser = argparse.ArgumentParser()
    add_config_args(parser, ControllerConfig)
    args = parser.parse_args(["--linear-speed", "3.5",
                              "--dnn-turn-angle", "20"])
    cfg = config_from_args(ControllerConfig, args)
    assert cfg.linear_speed == 3.5
    assert cfg.dnn_turn_angle == 20.0
    assert cfg.spin_rate_hz == 20.0  # untouched default
    echo = config_echo(cfg)
    assert "linear_speed" in echo and "3.5" in echo


def test_params_npz_roundtrip(tmp_path, rng):
    params = {"encoder": {"conv1": {"weights": rng.randn(3, 3, 2, 4)
                                    .astype(np.float32),
                                    "biases": np.zeros(4, np.float32)}},
              "head": {"w": rng.randn(4, 2).astype(np.float32)}}
    path = save_params(params, tmp_path / "p.npz")
    back = load_params(path)
    np.testing.assert_array_equal(
        back["encoder"]["conv1"]["weights"],
        params["encoder"]["conv1"]["weights"])
    np.testing.assert_array_equal(back["head"]["w"], params["head"]["w"])


def test_params_npz_bf16_roundtrip(tmp_path, rng):
    """bfloat16 leaves survive the npz round-trip with their dtype (npz
    would otherwise store ml_dtypes.bfloat16 as an opaque |V2 void)."""
    import jax.numpy as jnp

    params = {"w": jnp.asarray(rng.randn(4, 3), jnp.bfloat16),
              "b": np.zeros(3, np.float32)}
    back = load_params(save_params(params, tmp_path / "p.npz"))
    assert back["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(params["w"], np.float32),
                                  np.asarray(back["w"], np.float32))
    assert back["b"].dtype == np.float32


def test_params_orbax_roundtrip(tmp_path, rng):
    pytest.importorskip("orbax.checkpoint")
    params = {"a": {"w": rng.randn(4, 4).astype(np.float32)}}
    path = save_params(params, tmp_path / "ckpt")
    back = load_params(path)
    np.testing.assert_array_equal(back["a"]["w"], params["a"]["w"])


def test_camera_calibration_synthetic(tmp_path):
    """Render synthetic fisheye chessboard views and recover intrinsics."""
    cv2 = pytest.importorskip("cv2")
    import sys
    sys.path.insert(0, "tools")
    from calibrate_camera import calibrate, find_corners

    bw, bh, square = 9, 6, 0.03
    K_true = np.array([[320.0, 0, 320], [0, 320.0, 240], [0, 0, 1.0]])
    D_true = np.array([[0.05], [0.01], [0.0], [0.0]])
    objp = np.zeros((bw * bh, 3), np.float32)
    objp[:, :2] = np.mgrid[0:bw, 0:bh].T.reshape(-1, 2) * square
    rngs = np.random.RandomState(3)
    paths = []
    for i in range(8):
        rvec = rngs.uniform(-0.3, 0.3, 3)
        tvec = np.array([rngs.uniform(-0.05, 0.05),
                         rngs.uniform(-0.05, 0.05),
                         0.5 + 0.1 * i])
        pts, _ = cv2.fisheye.projectPoints(
            objp.reshape(1, -1, 3).astype(np.float64), rvec, tvec, K_true,
            D_true)
        img = np.full((480, 640), 255, np.uint8)
        # draw a chessboard-like pattern around projected corners
        grid = pts.reshape(bh, bw, 2)
        for r in range(bh - 1):
            for c in range(bw - 1):
                if (r + c) % 2 == 0:
                    quad = np.array([grid[r, c], grid[r, c + 1],
                                     grid[r + 1, c + 1], grid[r + 1, c]],
                                    np.int32)
                    cv2.fillConvexPoly(img, quad, 0)
        path = str(tmp_path / f"board_{i}.png")
        cv2.imwrite(path, img)
        paths.append(path)
    obj, imgp, shape, used = find_corners(paths, (bw - 2, bh - 2), square)
    if len(obj) < 3:
        pytest.skip("synthetic boards not detected by OpenCV")
    rms, K, D = calibrate(obj, imgp, shape)
    # crude rasterized boards -> loose gate; focal must land in the
    # right ballpark of the ground truth (320)
    assert rms < 15.0
    assert 150 < K[0, 0] < 650


def test_setup_logging_levels(capsys):
    import logging

    from redtail_tpu.utils.logging import setup_logging

    root = setup_logging("warning", {"redtail_tpu.telemetry": "debug"})
    assert root.level == logging.WARNING
    assert logging.getLogger("redtail_tpu.telemetry").level == logging.DEBUG
