"""FCU arming-handshake and debug-node tests."""

import math

import numpy as np
import pytest

from redtail_tpu.control import Controller, ControllerConfig, ControllerState, Drone, Pose
from redtail_tpu.control.fcu import SimulatedFcu, arm_sequence
from redtail_tpu.runtime.debug_node import probs_to_debug_pose


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, dt):
        self.t += dt


def test_arm_sequence_success_with_retries():
    ctl = Controller(Drone(), ControllerConfig())
    fcu = SimulatedFcu(accept_after=3)  # both services fail twice
    clock = FakeClock()
    ok = arm_sequence(ctl, fcu, get_pose=lambda: Pose(np.zeros(3)),
                      clock=clock, sleep=clock.sleep, retry_sec=5.0,
                      timeout_sec=30.0)
    assert ok
    assert ctl.state == ControllerState.ARMED
    assert fcu.mode_requests >= 3 and fcu.arm_requests >= 3
    # warmup setpoints streamed before anything else
    assert len(fcu.setpoints) >= 20


def test_arm_sequence_timeout():
    ctl = Controller(Drone(), ControllerConfig())
    fcu = SimulatedFcu(accept_after=10**9)  # never accepts
    clock = FakeClock()
    ok = arm_sequence(ctl, fcu, get_pose=lambda: Pose(np.zeros(3)),
                      clock=clock, sleep=clock.sleep, retry_sec=5.0,
                      timeout_sec=30.0)
    assert not ok
    assert ctl.state == ControllerState.NOOP
    assert clock.t >= 30.0


def test_warmup_pose_smoothing():
    ctl = Controller(Drone(), ControllerConfig())
    fcu = SimulatedFcu(accept_after=1)
    clock = FakeClock()
    poses = iter([Pose(np.array([0.0, 0.0, float(i)])) for i in
                  range(100)])
    arm_sequence(ctl, fcu, get_pose=lambda: next(poses), clock=clock,
                 sleep=clock.sleep, warmup_iters=10, smoothing=0.9)
    # smoothed z lags the raw trajectory
    assert 0 < ctl.current_pose.position[2] < 9


def test_debug_pose_mapping():
    pose = probs_to_debug_pose([0.8, 0.1, 0.1, 0.2, 0.3, 0.5])
    assert pose.yaw == pytest.approx(math.pi / 2 * 0.7)
    assert pose.y_offset == pytest.approx(-0.3)
    q = pose.as_quaternion()
    assert q.shape == (4,)
