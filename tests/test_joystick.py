"""Evdev joystick source: byte-stream parsing, axis scaling, button
edges, and graceful absence — the `/joy` input surface of the reference
controller (`px4_controller.cpp:178-236`), read straight from the
kernel's evdev layer (no joy_node)."""

import struct

from redtail_tpu.runtime.joystick import (ABS_RX, ABS_RY, ABS_X, ABS_Y,
                                          BTN_EAST, BTN_SOUTH, EV_ABS,
                                          EV_KEY, EVENT_SIZE, AbsInfo,
                                          EvdevJoystick, JoystickState)


def pack(etype, code, value):
    return struct.pack("qqHHi", 0, 0, etype, code, value)


def test_event_size_is_kernel_layout():
    # struct input_event on LP64: timeval (2 x u64) + u16 + u16 + s32
    assert EVENT_SIZE == 24


def test_axis_normalization_and_signs():
    st = JoystickState({ABS_X: AbsInfo(-32768, 32767),
                        ABS_Y: AbsInfo(0, 255)})
    # stick pushed fully forward: ABS_Y at its minimum -> linear +1
    st.feed(pack(EV_ABS, ABS_Y, 0))
    # stick fully left: ABS_X min -> angular +1 (left = positive turn)
    st.feed(pack(EV_ABS, ABS_X, -32768))
    cmd = st.command
    assert cmd.linear == 1.0
    assert cmd.angular == 1.0
    st.feed(pack(EV_ABS, ABS_Y, 255))
    assert st.command.linear == -1.0
    # center-ish
    st.feed(pack(EV_ABS, ABS_Y, 128))
    assert abs(st.command.linear) < 0.01


def test_right_stick_yaw_altitude():
    st = JoystickState()
    st.feed(pack(EV_ABS, ABS_RX, -32768))
    st.feed(pack(EV_ABS, ABS_RY, -32768))
    cmd = st.command
    assert cmd.yaw == 1.0 and cmd.altitude == 1.0


def test_button_edges_consumed_once():
    st = JoystickState()
    st.feed(pack(EV_KEY, BTN_SOUTH, 1))   # A pressed -> dnn_on
    st.feed(pack(EV_KEY, BTN_SOUTH, 0))   # release: no new edge
    cmd = st.command
    assert cmd.dnn_on and not cmd.dnn_off
    assert not st.command.dnn_on         # edge consumed by first read
    st.feed(pack(EV_KEY, BTN_EAST, 1))
    assert st.command.dnn_off


def test_partial_chunks_reassemble():
    st = JoystickState()
    data = pack(EV_ABS, ABS_X, -32768) + pack(EV_KEY, BTN_SOUTH, 1)
    assert st.feed(data[:10]) == 0
    assert st.feed(data[10:30]) == 1
    assert st.feed(data[30:]) == 1
    cmd = st.command
    assert cmd.angular == 1.0 and cmd.dnn_on


def test_unknown_events_ignored():
    st = JoystickState()
    st.feed(pack(0x04, 0x04, 123))        # EV_MSC scan codes
    st.feed(pack(EV_ABS, 0x10, 1))        # hat axis (unmapped)
    cmd = st.command
    assert cmd.linear == cmd.angular == 0.0


def test_missing_device_is_graceful():
    js = EvdevJoystick("/dev/input/event-nonexistent",
                       lambda cmd: None)
    assert js.start() is False
    js.stop()  # no-op, must not raise


def test_device_stream_via_pipe(tmp_path):
    """Full reader loop against a synthetic device (a plain file of
    packed events — read() semantics match the evdev char device)."""
    events = (pack(EV_ABS, ABS_Y, -32768)
              + pack(EV_KEY, BTN_SOUTH, 1))
    dev = tmp_path / "event7"
    dev.write_bytes(events)
    got = []
    js = EvdevJoystick(str(dev), got.append)
    # absinfo ioctl fails on a regular file -> default ranges; start
    # still succeeds and the reader thread drains the stream.
    assert js.start() is True
    js._thread.join(timeout=2.0)
    js.stop()
    assert got, "no commands delivered"
    assert got[-1].linear == 1.0
    assert any(c.dnn_on for c in got)
