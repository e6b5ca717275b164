"""Full-stack integration tests — the analogue of the reference's rostest
harness (`caffe_ros/tests/tests_basic.launch` spun 5 real DNN nodes at
FP32/FP16/INT8 and compared predictions; `everything.launch` composed
camera -> TrailNet(30Hz) + YOLO(1Hz) -> controller)."""

import dataclasses
import time

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import REFERENCE, requires_reference


@requires_reference
def test_precision_matrix_trailnet():
    """One TrailNet graph served at fp32 / bf16 / int8 simultaneously,
    outputs compared pairwise — the reference's FP32/FP16/INT8 node matrix
    (tolerances: bf16 within the FP16-class 2e-2 gate for probabilities;
    int8 compared on the feature level, see test_quant)."""
    from redtail_tpu.models.trailnet import load_trailnet

    frame = np.random.RandomState(0).randint(
        0, 256, (180, 320, 3)).astype(np.float32)
    net32 = load_trailnet(seed=11, dtype=jnp.float32)
    net16 = load_trailnet(seed=11, dtype=jnp.bfloat16)
    p32 = np.asarray(net32(frame), np.float32)
    p16 = np.asarray(net16(frame.astype(np.float32)), np.float32)
    assert p32.shape == p16.shape == (1, 6)
    # same gate class as the reference's FP16 node test (2e-2,
    # `caffe_ros/tests/tests.cpp:278`)... bf16 has fewer mantissa bits
    # than fp16, so allow 5e-2 on softmax outputs.
    assert np.abs(p32 - p16).max() < 5e-2


def test_stereo_node_s2d_ingest_parity(monkeypatch):
    """StereoNode with the s2d-packed ingest (REDTAIL_TPU_S2D=1: host
    pack + 3x3 stem — the TPU serving path) must match the raw-stem
    node on identical camera frames, including host-side resize."""
    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.runtime.nodes import StereoNode

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(64, 128), max_disp=8)
    params = init_stereo_params(spec)
    rs = np.random.RandomState(3)
    left = rs.randint(0, 256, (64, 128, 3)).astype(np.uint8)
    right = rs.randint(0, 256, (64, 128, 3)).astype(np.uint8)

    monkeypatch.setenv("REDTAIL_TPU_S2D", "0")
    raw = StereoNode(spec, params, dtype=jnp.float32)(left, right)
    monkeypatch.setenv("REDTAIL_TPU_S2D", "1")
    packed = StereoNode(spec, params, dtype=jnp.float32)(left, right)
    assert raw.shape == packed.shape
    # identical preprocessing; conv1 re-associated only, amplified by
    # soft-argmax x width — gate at 0.1 px (measured max 0.04 px).
    np.testing.assert_allclose(packed, raw, atol=0.1)


@requires_reference
def test_everything_pipeline():
    """Camera pair -> stereo + TrailNet + YOLO + controller, all in
    process, rates decoupled — the everything.launch topology."""
    from redtail_tpu.control import (
        Controller, ControllerConfig, Drone, FcuState, JoyCommand, Pose)
    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.models.trailnet import load_trailnet
    from redtail_tpu.runtime import NodeGraph, StageProfiler
    from redtail_tpu.runtime.nodes import StereoNode, TrailNetNode, YoloNode
    from redtail_tpu.models.caffe_net import CaffeNet
    from redtail_tpu.io.caffe import load_prototxt

    prof = StageProfiler()
    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(64, 128), max_disp=8)
    stereo = StereoNode(spec, init_stereo_params(spec), profiler=prof)
    trailnet = TrailNetNode(load_trailnet(seed=2), profiler=prof)
    yolo = YoloNode(CaffeNet(load_prototxt(
        REFERENCE / "models/pretrained/yolo-relu.prototxt"), seed=2),
        profiler=prof)

    ctl = Controller(Drone(), ControllerConfig())
    ctl.set_fcu_state(FcuState(mode="OFFBOARD", armed=True))
    ctl.set_pose(Pose(np.zeros(3)))
    ctl.arm()
    ctl.step()
    ctl.set_pose(Pose(np.array([0.0, 0.0, 1.5])))
    ctl.step()
    ctl.on_joystick(JoyCommand(dnn_on=True))

    g = NodeGraph()
    g.add_node("stereo", stereo, ["cam/left", "cam/right"],
               "stereo/disparity", max_rate_hz=30, sync_slop=0.2)

    def trail_stage(frame):
        probs = trailnet(frame)
        ctl.on_trailnet(probs)
        return probs

    def yolo_stage(frame):
        dets = yolo(frame)
        ctl.on_objects(dets)
        return dets

    def control_stage(_probs):
        ctl.step()
        return None

    g.add_node("trailnet", trail_stage, ["cam/left"],
               "trails_dnn/network/output", max_rate_hz=30)
    g.add_node("yolo", yolo_stage, ["cam/left"],
               "object_dnn/network/output", max_rate_hz=1)
    g.add_node("controller", control_stage,
               ["trails_dnn/network/output"], None, max_rate_hz=20)

    rs = np.random.RandomState(0)
    frame_l = rs.randint(0, 256, (64, 128, 3), np.uint8)
    frame_r = rs.randint(0, 256, (64, 128, 3), np.uint8)
    # warm-up (compile) before spinning — the reference likewise built its
    # engines before entering the node loop (`tensor_net.cpp:194-213`).
    stereo(frame_l, frame_r)
    trailnet(frame_l)
    yolo(frame_l)
    g.start()
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            stamp = time.monotonic()
            g.topic("cam/left").publish(frame_l, stamp=stamp)
            g.topic("cam/right").publish(frame_r, stamp=stamp)
            if (g.topic("stereo/disparity").latest() is not None
                    and g.topic("trails_dnn/network/output").latest()
                    is not None
                    and g.nodes["yolo"].processed >= 1
                    and ctl.dnn_commands >= 2):
                break
            time.sleep(0.05)
    finally:
        g.stop()

    assert g.topic("stereo/disparity").latest().data.shape == (64, 128)
    probs = g.topic("trails_dnn/network/output").latest().data
    assert probs.shape == (6,)
    assert g.nodes["yolo"].processed >= 1
    assert ctl.dnn_commands >= 2          # DNN commands flowed end-to-end
    assert ctl.ai_score == 1.0            # telemetry contract
    assert not g.stalled_nodes(max_silence_sec=30)
    assert all(n.errors == 0 for n in g.nodes.values())
    # per-stage profiler captured every DNN stage (IProfiler role)
    stats = prof.stats()
    assert any(k.startswith("stereo/") for k in stats)
    assert "trailnet" in stats and "yolo/dnn" in stats
