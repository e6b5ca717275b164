"""MAVLink wire-protocol tests.

The CRC_EXTRA values are derived from the field tables in
`control/mavlink.py`; pinning them against the published common-dialect
constants proves the field tables (names, types, wire order) are exactly
the upstream definitions — a wrong table cannot round-trip quietly.
"""

import numpy as np
import pytest

from redtail_tpu.control import Controller, ControllerConfig, \
    ControllerState, Drone, Pose
from redtail_tpu.control.fcu import arm_sequence
from redtail_tpu.control.geometry import yaw_quat
from redtail_tpu.control.mavlink import (
    APM_ROVER_MODES,
    COMMAND_ACK,
    COMMAND_LONG,
    HEARTBEAT,
    LOCAL_POSITION_NED,
    MAGIC_V1,
    MavlinkFcu,
    MicroAutopilot,
    Deframer,
    LoopbackLink,
    SET_MODE,
    SET_POSITION_TARGET_LOCAL_NED,
    UdpLink,
    pack_frame,
    x25_crc,
)


def test_x25_crc_known_vector():
    # MAVLink's CRC is CRC-16/MCRF4XX; published check value 0x6F91.
    assert x25_crc(b"123456789") == 0x6F91


def test_crc_extra_matches_published_constants():
    # Published CRC_EXTRA bytes from the MAVLink common dialect.
    assert HEARTBEAT.crc_extra == 50
    assert SET_MODE.crc_extra == 89
    assert LOCAL_POSITION_NED.crc_extra == 185
    assert COMMAND_LONG.crc_extra == 152
    assert COMMAND_ACK.crc_extra == 143
    assert SET_POSITION_TARGET_LOCAL_NED.crc_extra == 143


def test_pack_parse_roundtrip():
    frame = pack_frame(SET_POSITION_TARGET_LOCAL_NED, 7, 255, 190, dict(
        time_boot_ms=1234, target_system=1, target_component=1,
        coordinate_frame=1, type_mask=0x0BF8, x=1.5, y=-2.5, z=-10.0,
        yaw=0.25))
    assert frame[0] == MAGIC_V1
    msgs = Deframer().feed(frame)
    assert len(msgs) == 1
    msgid, vals, sysid = msgs[0]
    assert msgid == SET_POSITION_TARGET_LOCAL_NED.msgid
    assert sysid == 255
    assert vals["time_boot_ms"] == 1234
    assert vals["x"] == pytest.approx(1.5)
    assert vals["z"] == pytest.approx(-10.0)
    assert vals["type_mask"] == 0x0BF8


def test_deframer_rejects_corruption_and_resyncs():
    good = pack_frame(HEARTBEAT, 0, 1, 1, dict(
        type=2, autopilot=12, base_mode=129, custom_mode=6 << 16,
        system_status=4, mavlink_version=3))
    corrupted = bytearray(good)
    corrupted[10] ^= 0xFF
    d = Deframer()
    # garbage + corrupted frame + split good frame across two feeds
    assert d.feed(b"\x00\x13garbage" + bytes(corrupted) + good[:9]) == []
    msgs = d.feed(good[9:])
    assert len(msgs) == 1 and msgs[0][0] == HEARTBEAT.msgid
    assert d.bad_crc >= 1


def test_deframer_parses_mavlink2_frames():
    """PX4 links speak MAVLink 2 unprompted: 0xFD magic, 3-byte msgid,
    zero-truncated payloads. The deframer must accept them (the
    reference talked to PX4 through MAVROS, which negotiates v2)."""
    import struct

    from redtail_tpu.control.mavlink import x25_crc

    def pack_v2(msg, seq, sysid, compid, values):
        payload = struct.pack(
            msg.fmt, *(values.get(n, 0) for n, _ in msg.wire_fields))
        trimmed = payload.rstrip(b"\x00") or payload[:1]
        header = struct.pack("<BBBBBBBBBB", 0xFD, len(trimmed), 0, 0,
                             seq & 0xFF, sysid, compid,
                             msg.msgid & 0xFF, (msg.msgid >> 8) & 0xFF,
                             (msg.msgid >> 16) & 0xFF)
        crc = x25_crc(header[1:] + trimmed)
        crc = x25_crc(bytes([msg.crc_extra]), crc)
        return header + trimmed + struct.pack("<H", crc)

    hb = pack_v2(HEARTBEAT, 0, 1, 1, dict(
        type=2, autopilot=12, base_mode=129, custom_mode=6 << 16,
        system_status=4, mavlink_version=3))
    ack = pack_v2(COMMAND_ACK, 1, 1, 1, dict(command=400, result=0))
    d = Deframer()
    msgs = d.feed(hb + b"\x91junk" + ack)
    assert [m[0] for m in msgs] == [HEARTBEAT.msgid, COMMAND_ACK.msgid]
    assert msgs[0][1]["custom_mode"] == 6 << 16
    assert msgs[0][1]["base_mode"] == 129
    assert msgs[1][1]["command"] == 400 and msgs[1][1]["result"] == 0
    assert msgs[0][2] == 1  # sysid from the v2 header position


def test_arm_sequence_over_the_wire():
    """Full byte-level handshake: MavlinkFcu <-> MicroAutopilot through
    the loopback link, driven by the same `arm_sequence` the reference
    runs against MAVROS (`px4_controller.cpp:631-689`)."""
    link = LoopbackLink()
    t = [0.0]

    def clock():
        return t[0]

    ap = MicroAutopilot(link.b, accept_after=2)  # exercise a retry
    fcu = MavlinkFcu(link.a, clock=clock)

    def sleep(dt):
        t[0] += dt
        ap.step()

    ctl = Controller(Drone(), ControllerConfig())
    ap.step()  # first heartbeat in flight before we start
    ok = arm_sequence(ctl, fcu, get_pose=lambda: Pose(np.zeros(3)),
                      clock=clock, sleep=sleep, retry_sec=0.2,
                      timeout_sec=10.0)
    assert ok
    assert ctl.state == ControllerState.ARMED
    assert ap.armed and ap.custom_mode == 6 << 16  # PX4 OFFBOARD
    assert ap.mode_requests >= 2 and ap.arm_requests >= 2
    assert len(ap.setpoints) >= 20  # warm-up stream reached the wire


def test_setpoint_enu_to_ned():
    link = LoopbackLink()
    fcu = MavlinkFcu(link.a)
    ap = MicroAutopilot(link.b)
    fcu.publish_setpoint(Pose(np.array([1.0, 2.0, 3.0]),
                              yaw_quat(np.pi / 2)))
    ap.step()
    x, y, z, yaw = ap.setpoints[0]
    assert (x, y, z) == pytest.approx((2.0, 1.0, -3.0))
    assert yaw == pytest.approx(0.0)  # ENU pi/2 (north) -> NED 0


def test_apm_rover_mode_union():
    link = LoopbackLink()
    fcu = MavlinkFcu(link.a, px4=False)
    ap = MicroAutopilot(link.b, px4=False)
    assert fcu.set_mode("GUIDED")
    ap.step()
    assert ap.custom_mode == APM_ROVER_MODES["GUIDED"]
    st = fcu.state()
    assert st.mode == "GUIDED" and not st.armed


def test_pack_frame_v2_roundtrip_zero_truncation():
    """Our own v2 emission: 0xFD magic, 3-byte msgid, payload
    zero-truncated on the wire, restored by the deframer."""
    from redtail_tpu.control.mavlink import MAGIC_V2

    frame = pack_frame(COMMAND_LONG, 3, 255, 190, dict(
        target_system=1, target_component=1, command=400, confirmation=0,
        param1=1.0), version=2)
    assert frame[0] == MAGIC_V2
    full = 33  # COMMAND_LONG payload: 7 floats + u16 + 3 u8
    assert len(frame) < 10 + full + 2  # trailing zero params truncated
    msgs = Deframer().feed(frame)
    assert len(msgs) == 1
    msgid, vals, sysid = msgs[0]
    assert msgid == COMMAND_LONG.msgid and sysid == 255
    assert vals["command"] == 400 and vals["param1"] == pytest.approx(1.0)
    assert vals["param7"] == pytest.approx(0.0)  # truncated zeros restored


def test_v2_signed_frame_accepted_signature_skipped():
    """Signed v2 frames (incompat 0x01): length/CRC are unaffected by
    the 13-byte signature, so the frame parses normally; the signature
    is consumed without being counted as garbage (no bad_crc)."""
    import struct

    payload = struct.pack(COMMAND_ACK.fmt, 400, 0)
    header = struct.pack("<BBBBBBBBBB", 0xFD, len(payload), 0x01, 0, 5,
                         1, 1, COMMAND_ACK.msgid, 0, 0)
    crc = x25_crc(header[1:] + payload)
    crc = x25_crc(bytes([COMMAND_ACK.crc_extra]), crc)
    signed = header + payload + struct.pack("<H", crc) + b"\x07" * 13
    follow = pack_frame(HEARTBEAT, 6, 1, 1, dict(
        type=2, autopilot=12, base_mode=129, custom_mode=6 << 16,
        system_status=4, mavlink_version=3))
    d = Deframer()
    msgs = d.feed(signed + follow)
    assert [m[0] for m in msgs] == [COMMAND_ACK.msgid, HEARTBEAT.msgid]
    assert d.bad_crc == 0


def test_arm_sequence_v1_fallback_mode():
    """The v1 emit path stays available (version=1 on both ends)."""
    link = LoopbackLink()
    fcu = MavlinkFcu(link.a, version=1)
    ap = MicroAutopilot(link.b, version=1)
    assert fcu.set_mode("OFFBOARD")
    ap.step()
    assert ap.custom_mode == 6 << 16
    fcu.arm()  # request processed (and ACKed) on the autopilot's step
    ap.step()
    fcu.publish_setpoint(Pose(np.array([1.0, 0.0, 2.0])))
    ap.step()
    assert len(ap.setpoints) == 1
    st = fcu.state()
    assert st.mode == "OFFBOARD" and st.armed


def test_udp_spoofed_datagram_does_not_retarget():
    """Once paired, a datagram from another source must not capture the
    setpoint stream (round-2 review finding)."""
    import socket
    import time

    peer = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    peer.bind(("127.0.0.1", 0))
    peer.setblocking(False)
    spoof = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    spoof.bind(("127.0.0.1", 0))
    spoof.setblocking(False)
    try:
        link = UdpLink(("127.0.0.1", peer.getsockname()[1]),
                       local=("127.0.0.1", 0))
        link_addr = link._sock.getsockname()
        # pair: peer talks first (from its configured address -> pins)
        peer.sendto(b"\x01hello", link_addr)
        deadline = time.time() + 2.0
        while not link.recv() and time.time() < deadline:
            time.sleep(0.01)
        assert link._pinned
        # spoof from a different port on the same host
        spoof.sendto(b"\x02spoof", link_addr)
        deadline = time.time() + 2.0
        while not link.recv() and time.time() < deadline:
            time.sleep(0.01)
        frame = pack_frame(COMMAND_ACK, 0, 1, 1,
                           dict(command=400, result=0))
        link.send(frame)
        got, spoof_got = b"", b""
        deadline = time.time() + 2.0
        while not got and time.time() < deadline:
            try:
                got, _ = peer.recvfrom(65535)
            except BlockingIOError:
                time.sleep(0.01)
        try:
            spoof_got, _ = spoof.recvfrom(65535)
        except BlockingIOError:
            pass
        assert got == frame      # paired peer still receives
        assert spoof_got == b""  # spoofer captured nothing
    finally:
        peer.close()
        spoof.close()


def test_udp_link_loopback():
    import socket

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    port = rx.getsockname()[1]
    rx.close()
    a = UdpLink(("127.0.0.1", port), local=("127.0.0.1", port))
    frame = pack_frame(COMMAND_ACK, 0, 1, 1, dict(command=400, result=0))
    a.send(frame)
    import time
    deadline = time.time() + 2.0
    got = b""
    while not got and time.time() < deadline:
        got = a.recv()
    assert got == frame


def test_udp_link_hostname_remote_pins_numeric_peer():
    """A hostname-configured remote ('localhost') must still adopt the
    numeric reply address — recvfrom reports IPs, so the pinning
    compares only work if the configured host resolves at __init__
    (round-3 review finding)."""
    import socket
    import time

    peer = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    peer.bind(("127.0.0.1", 0))
    peer.setblocking(False)
    try:
        link = UdpLink(("localhost", 14999),  # NOT peer's real port
                       local=("127.0.0.1", 0))
        assert link._configured[0] == "127.0.0.1"  # resolved at init
        link_addr = link._sock.getsockname()
        # peer replies from its own (ephemeral-style) port: same host,
        # different port than configured -> host-gated first-contact pin
        peer.sendto(b"\x01hello", link_addr)
        deadline = time.time() + 2.0
        while not link.recv() and time.time() < deadline:
            time.sleep(0.01)
        assert link._pinned
        assert link._remote == peer.getsockname()
        frame = pack_frame(COMMAND_ACK, 0, 1, 1,
                           dict(command=400, result=0))
        link.send(frame)
        got = b""
        deadline = time.time() + 2.0
        while not got and time.time() < deadline:
            try:
                got, _ = peer.recvfrom(65535)
            except BlockingIOError:
                time.sleep(0.01)
        assert got == frame
    finally:
        peer.close()


# ------------------------------------------------------------- signing


KEY = bytes(range(32))


def test_signed_roundtrip_and_trailer_layout():
    """Outbound signing: IFLAG_SIGNED set, 13-byte trailer =
    link_id + 48-bit timestamp + sha256_48, verified by a same-key
    deframer; timestamps strictly increase even with a frozen clock."""
    from redtail_tpu.control.mavlink import Signer

    tx = Signer(KEY, link_id=3, clock=lambda: 1420070400.0 + 1.0)
    f1 = pack_frame(COMMAND_ACK, 0, 1, 1, dict(command=400, result=0),
                    version=2, signing=tx)
    f2 = pack_frame(COMMAND_ACK, 1, 1, 1, dict(command=400, result=0),
                    version=2, signing=tx)
    assert f1[2] & 0x01  # incompat IFLAG_SIGNED
    assert f1[-13] == 3  # link_id leads the trailer
    ts1 = int.from_bytes(f1[-12:-6], "little")
    ts2 = int.from_bytes(f2[-12:-6], "little")
    assert ts1 == 100000  # 1 s past the 2015 epoch in 10 us units
    assert ts2 == ts1 + 1  # frozen clock: monotonic bump, never reuse
    d = Deframer(signing=Signer(KEY))
    assert [m[0] for m in d.feed(f1 + f2)] == [COMMAND_ACK.msgid] * 2
    assert d.signing.bad_sig == 0 and d.signing.replays == 0


def test_tampered_signature_rejected():
    from redtail_tpu.control.mavlink import Signer

    frame = pack_frame(COMMAND_ACK, 0, 1, 1, dict(command=400, result=0),
                       version=2, signing=Signer(KEY))
    bad = frame[:-1] + bytes([frame[-1] ^ 0xFF])
    d = Deframer(signing=Signer(KEY))
    assert d.feed(bad) == []
    assert d.signing.bad_sig == 1
    # stream survives: a good frame right after still parses
    good = pack_frame(COMMAND_ACK, 1, 1, 1, dict(command=400, result=0),
                      version=2, signing=Signer(KEY))
    assert [m[0] for m in d.feed(good)] == [COMMAND_ACK.msgid]


def test_tampered_payload_with_fixed_crc_rejected():
    """An attacker who fixes up the CRC after mutating the payload must
    still fail the signature (the sha256_48 covers header..crc)."""
    import struct

    from redtail_tpu.control.mavlink import Signer

    frame = pack_frame(COMMAND_ACK, 0, 1, 1, dict(command=400, result=0),
                       version=2, signing=Signer(KEY))
    hdr, length = bytearray(frame), frame[1]
    hdr[10] ^= 0x01  # first payload byte (command id)
    body = bytes(hdr[1:10 + length])
    crc = x25_crc(body)
    crc = x25_crc(bytes([COMMAND_ACK.crc_extra]), crc)
    hdr[10 + length:12 + length] = struct.pack("<H", crc)
    d = Deframer(signing=Signer(KEY))
    assert d.feed(bytes(hdr)) == []
    assert d.signing.bad_sig == 1


def test_replayed_frame_rejected():
    from redtail_tpu.control.mavlink import Signer

    frame = pack_frame(COMMAND_ACK, 0, 1, 1, dict(command=400, result=0),
                       version=2, signing=Signer(KEY))
    d = Deframer(signing=Signer(KEY))
    assert len(d.feed(frame)) == 1
    assert d.feed(frame) == []  # byte-identical replay
    assert d.signing.replays == 1 and d.signing.bad_sig == 0


def test_wrong_key_rejected():
    from redtail_tpu.control.mavlink import Signer

    frame = pack_frame(COMMAND_ACK, 0, 1, 1, dict(command=400, result=0),
                       version=2, signing=Signer(KEY))
    d = Deframer(signing=Signer(bytes(32)))
    assert d.feed(frame) == []
    assert d.signing.bad_sig == 1


def test_unsigned_frames_dropped_when_signing_required():
    """With a key configured the deframer enforces signing: unsigned v1
    AND v2 frames are dropped (counted) unless allow_unsigned."""
    from redtail_tpu.control.mavlink import Signer

    v1 = pack_frame(COMMAND_ACK, 0, 1, 1, dict(command=400, result=0))
    v2 = pack_frame(COMMAND_ACK, 1, 1, 1, dict(command=400, result=0),
                    version=2)
    strict = Deframer(signing=Signer(KEY))
    assert strict.feed(v1 + v2) == []
    assert strict.dropped_unsigned == 2 and strict.bad_crc == 0
    lenient = Deframer(signing=Signer(KEY), allow_unsigned=True)
    assert [m[0] for m in lenient.feed(v1 + v2)] == [COMMAND_ACK.msgid] * 2


def test_arm_sequence_signed_end_to_end():
    """Full handshake with BOTH ends signing and enforcing: same byte
    path as test_arm_sequence_over_the_wire, plus sha256_48 trailers on
    every frame in both directions."""
    link = LoopbackLink()
    t = [0.0]

    def clock():
        return t[0]

    ap = MicroAutopilot(link.b, signing_key=KEY, link_id=1)
    fcu = MavlinkFcu(link.a, clock=clock, signing_key=KEY, link_id=0)

    def sleep(dt):
        t[0] += dt
        ap.step()

    ctl = Controller(Drone(), ControllerConfig())
    ap.step()
    ok = arm_sequence(ctl, fcu, get_pose=lambda: Pose(np.zeros(3)),
                      clock=clock, sleep=sleep, retry_sec=0.2,
                      timeout_sec=10.0)
    assert ok
    assert ap.armed and ap.custom_mode == 6 << 16
    assert fcu.signing.bad_sig == 0 and ap.signing.bad_sig == 0
    assert len(ap.setpoints) >= 20


def test_signed_fcu_ignores_unsigned_autopilot():
    """Key mismatch across the link: an unsigned (or wrong-keyed)
    autopilot can never update the signed FCU's state — the spoofed-FCU
    threat signing exists for."""
    link = LoopbackLink()
    fcu = MavlinkFcu(link.a, signing_key=KEY)
    ap_unsigned = MicroAutopilot(link.b)
    ap_unsigned.armed = True
    ap_unsigned.step()  # emits an armed HEARTBEAT, unsigned
    st = fcu.state()
    assert not st.armed and not st.mode  # default FcuState untouched
    assert fcu._deframer.dropped_unsigned >= 1
