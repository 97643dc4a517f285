"""Unitree legged_sdk v3.2 wire protocol codec (native/unitree_codec.cpp).

The byte layouts + crc32_core the reference speaks to real hardware
(reference: HardwareInterface.cpp:7, 86-120; UnitreeComm.hpp:28). Checks:
struct-size regression pins, CRC cross-checked against an independent
pure-Python reimplementation of the SDK's word-wise crc32_core, encode/
decode round trips incl. the internal<->wire index swap, corruption
rejection, and the PositionLimit/PowerProtect safety clamps.
"""

import numpy as np
import pytest

from legged_mpc_control_tpu import native


@pytest.fixture(scope="module")
def codec():
    return native.UnitreeCodec()


def py_crc32_core(words):
    """Independent reimplementation of the SDK's crc32_core."""
    crc = 0xFFFFFFFF
    poly = 0x04C11DB7
    for w in words:
        xbit = 1 << 31
        for _ in range(32):
            if crc & 0x80000000:
                crc = ((crc << 1) & 0xFFFFFFFF) ^ poly
            else:
                crc = (crc << 1) & 0xFFFFFFFF
            if w & xbit:
                crc ^= poly
            xbit >>= 1
    return crc


def test_struct_sizes(codec):
    """Regression pins for the packed v3.2 layouts: header(10) + payload +
    wirelessRemote(40) + reserve(4) + crc(4); MotorCmd=33, MotorState=38,
    IMU=53."""
    assert codec.lowcmd_size == 10 + 20 * 33 + 4 * 3 + 40 + 8
    assert codec.lowstate_size == 10 + 53 + 20 * 38 + 8 + 8 + 4 + 40 + 8
    assert codec.highcmd_size == 10 + 1 + 8 * 4 + 4 * 3 + 40 + 40 + 8
    # all CRC'd over full words
    for s in (codec.lowcmd_size, codec.lowstate_size, codec.highcmd_size,
              codec.highstate_size):
        assert s % 4 in (0, 1, 2, 3)   # sizes are byte-packed
    assert codec.crc32(b"\x00" * 8) == py_crc32_core([0, 0])


def test_crc_matches_independent_python(codec):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
    words = np.frombuffer(data, dtype="<u4")
    assert codec.crc32(data) == py_crc32_core([int(w) for w in words])


def test_lowcmd_roundtrip_with_index_swap(codec):
    # within A1 limits per joint type (HAA +-0.8, HFE -1..4.2, KFE -2.7..-0.9)
    q = np.tile([0.1, 0.8, -1.6], 4) + np.repeat(
        [-0.03, -0.01, 0.01, 0.03], 3)
    dq = np.linspace(-1.0, 1.0, 12)
    tau = np.linspace(-5.0, 5.0, 12)
    kp = np.full(12, 100.0)
    kd = np.full(12, 5.0)
    pkt = codec.encode_lowcmd(q, dq, tau, kp, kd, q_state=q)
    assert len(pkt) == codec.lowcmd_size
    # levelFlag LOWLEVEL
    assert pkt[0] == 0xFF
    out = codec.decode_lowcmd(pkt)
    np.testing.assert_allclose(out["q"], q, atol=1e-6)
    np.testing.assert_allclose(out["dq"], dq, atol=1e-6)
    np.testing.assert_allclose(out["tau"], tau, atol=1e-6)
    np.testing.assert_allclose(out["kp"], kp)
    np.testing.assert_allclose(out["kd"], kd)

    # the wire carries Unitree order: FL's HAA (internal 0) must sit in
    # wire slot 3 (reference swap_joint_indices, HardwareInterface.cpp:27)
    body = np.frombuffer(pkt, dtype=np.uint8)
    # MotorCmd array starts at offset 10; q is at +1 within the 33B struct
    q_wire3 = np.frombuffer(body[10 + 3 * 33 + 1:10 + 3 * 33 + 5].tobytes(),
                            dtype="<f4")[0]
    assert abs(q_wire3 - q[0]) < 1e-6


def test_lowstate_roundtrip(codec):
    quat = np.array([0.99, 0.01, -0.02, 0.1])
    gyro = np.array([0.1, -0.2, 0.3])
    acc = np.array([0.0, 0.1, 9.8])
    q = np.linspace(-0.4, 0.4, 12)
    dq = np.linspace(-2, 2, 12)
    tau = np.linspace(-3, 3, 12)
    ff = np.array([50.0, 60.0, 70.0, 80.0])
    pkt = codec.encode_lowstate(quat, gyro, acc, q, dq, tau, ff, tick=77)
    assert len(pkt) == codec.lowstate_size
    st = codec.decode_lowstate(pkt)
    np.testing.assert_allclose(st["quat"], quat, atol=1e-6)
    np.testing.assert_allclose(st["gyro"], gyro, atol=1e-6)
    np.testing.assert_allclose(st["acc"], acc, atol=1e-6)
    np.testing.assert_allclose(st["q"], q, atol=1e-6)
    np.testing.assert_allclose(st["dq"], dq, atol=1e-6)
    np.testing.assert_allclose(st["tau_est"], tau, atol=1e-6)
    np.testing.assert_allclose(st["foot_force"], ff)  # int16 exact here
    assert st["tick"] == 77


def test_corruption_rejected(codec):
    pkt = bytearray(codec.encode_lowstate(
        np.array([1.0, 0, 0, 0]), np.zeros(3), np.zeros(3),
        np.zeros(12), np.zeros(12), np.zeros(12), np.zeros(4)))
    pkt[20] ^= 0x5A
    with pytest.raises(ValueError):
        codec.decode_lowstate(bytes(pkt))
    # wrong level flag also rejected
    pkt2 = bytearray(codec.encode_lowcmd(
        np.zeros(12), np.zeros(12), np.zeros(12),
        np.zeros(12), np.zeros(12)))
    pkt2[0] = 0x00
    with pytest.raises(ValueError):
        codec.decode_lowcmd(bytes(pkt2))


def test_safety_clamps(codec):
    """PositionLimit clamps targets to the mechanical range; PowerProtect
    scales the torque budget by level/10 (reference:
    HardwareInterface.cpp:113-115, Safety::PositionLimit/PowerProtect)."""
    q_wild = np.full(12, 10.0)           # far past every joint limit
    tau_wild = np.full(12, 100.0)
    out = codec.decode_lowcmd(codec.encode_lowcmd(
        q_wild, np.zeros(12), tau_wild, np.zeros(12), np.zeros(12),
        q_state=np.zeros(12), power_protect_level=10))
    # HAA <= 0.802, HFE <= 4.19, KFE <= -0.916
    np.testing.assert_allclose(out["q"].reshape(4, 3)[:, 0], 0.802,
                               atol=1e-6)
    np.testing.assert_allclose(out["q"].reshape(4, 3)[:, 2], -0.916,
                               atol=1e-6)
    np.testing.assert_allclose(out["tau"], 33.5, atol=1e-6)
    out5 = codec.decode_lowcmd(codec.encode_lowcmd(
        q_wild, np.zeros(12), tau_wild, np.zeros(12), np.zeros(12),
        q_state=np.zeros(12), power_protect_level=5))
    np.testing.assert_allclose(out5["tau"], 33.5 * 0.5, atol=1e-5)


def test_highcmd_encode(codec):
    pkt = codec.encode_highcmd(mode=2, forward_speed=0.3, rotate_speed=0.1,
                               body_height=0.28)
    assert len(pkt) == codec.highcmd_size
    assert pkt[0] == 0x00                # HIGHLEVEL
    assert pkt[10] == 2                  # mode byte after the 10B header
    fs = np.frombuffer(pkt[11:15], dtype="<f4")[0]
    assert abs(fs - 0.3) < 1e-6


def test_udp_loopback_interface():
    """UnitreeHardwareInterface <-> emulated robot socket: real packets
    both ways (reference loop: HardwareInterface.cpp:86-201)."""
    import socket
    import time

    from legged_mpc_control_tpu.interfaces.hardware import (
        UnitreeHardwareInterface,
    )

    robot = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    robot.bind(("127.0.0.1", 0))
    robot.setblocking(False)
    rport = robot.getsockname()[1]

    iface = UnitreeHardwareInterface(bind=("127.0.0.1", 0),
                                     peer=("127.0.0.1", rport))
    iport = iface.sock.getsockname()[1]
    cod = native.UnitreeCodec()
    try:
        # robot -> controller state
        q_pose = np.tile([0.0, 0.8, -1.6], 4)     # valid standing pose
        st_pkt = cod.encode_lowstate(
            np.array([1.0, 0, 0, 0]), np.zeros(3),
            np.array([0, 0, 9.8]), q_pose, np.zeros(12),
            np.zeros(12), np.full(4, 40.0), tick=5)
        robot.sendto(st_pkt, ("127.0.0.1", iport))
        time.sleep(0.05)
        raw = iface.fbk_update()
        assert raw is not None
        np.testing.assert_allclose(raw["joint_pos"], q_pose, atol=1e-6)

        # controller -> robot command
        assert iface.send_cmd(q_pose + 0.01, np.zeros(12),
                              np.full(12, 1.0), np.full(12, 50.0),
                              np.full(12, 2.0))
        time.sleep(0.05)
        data, _ = robot.recvfrom(4096)
        cmd = cod.decode_lowcmd(data)
        np.testing.assert_allclose(cmd["q"], q_pose + 0.01, atol=1e-5)
        np.testing.assert_allclose(cmd["tau"], 1.0, atol=1e-6)
    finally:
        iface.close()
        robot.close()
