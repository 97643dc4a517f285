"""Interface-layer tests: joystick FSM, index swaps, protections, mocap
parsing, high-level codec, CLI smoke (reference components:
BaseInterface.cpp:122-209, HardwareInterface.cpp:27-120, mocap_optitrack,
unitree_highlevel_ctrl)."""

import json
import subprocess
import sys
import time

import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.config import a1_params
from legged_mpc_control_tpu.control import joy as joy_mod
from legged_mpc_control_tpu.control import step as step_mod
from legged_mpc_control_tpu.interfaces import hardware as hw
from legged_mpc_control_tpu.interfaces import highlevel as hl
from legged_mpc_control_tpu.interfaces import mocap

DTYPE = jnp.float64
PARAMS = a1_params(DTYPE)


# ---------- joystick / mode FSM ----------

def _axes(velx=0.0, vely=0.0, yaw=0.0, height=0.0):
    a = np.zeros(8)
    a[joy_mod.AXIS_VELX] = velx
    a[joy_mod.AXIS_VELY] = vely
    a[joy_mod.AXIS_YAW] = yaw
    a[joy_mod.AXIS_HEIGHT] = height
    return a


def test_joy_mode_toggle_rising_edge_only():
    cs = step_mod.controller_init(PARAMS, dtype=DTYPE)
    cs = cs.replace(estimation_inited=jnp.ones((), bool))
    btn = np.zeros(8)
    btn[joy_mod.BUTTON_MODE] = 1
    # press -> walk
    cs = joy_mod.joy_update(cs, _axes(), btn, 0.01, PARAMS)
    assert int(cs.ctrl.movement_mode) == 1
    # held -> no re-toggle
    cs = joy_mod.joy_update(cs, _axes(), btn, 0.01, PARAMS)
    assert int(cs.ctrl.movement_mode) == 1
    # release + press again -> back to stand
    cs = joy_mod.joy_update(cs, _axes(), np.zeros(8), 0.01, PARAMS)
    cs = joy_mod.joy_update(cs, _axes(), btn, 0.01, PARAMS)
    assert int(cs.ctrl.movement_mode) == 0


def test_joy_walk_blocked_until_estimation_ready():
    """reference: walk requires estimation_inited (BaseInterface.cpp:176)."""
    cs = step_mod.controller_init(PARAMS, dtype=DTYPE)
    btn = np.zeros(8)
    btn[joy_mod.BUTTON_MODE] = 1
    cs = joy_mod.joy_update(cs, _axes(), btn, 0.01, PARAMS)
    assert int(cs.ctrl.movement_mode) == 0


def test_joy_height_integration_clamped():
    cs = step_mod.controller_init(PARAMS, dtype=DTYPE)
    for _ in range(2000):                       # push the stick up for 20 s
        cs = joy_mod.joy_update(cs, _axes(height=1.0), np.zeros(8),
                                0.01, PARAMS)
    assert float(cs.joy.body_height) <= float(PARAMS.max_body_height) + 1e-9
    for _ in range(4000):
        cs = joy_mod.joy_update(cs, _axes(height=-1.0), np.zeros(8),
                                0.01, PARAMS)
    assert float(cs.joy.body_height) >= float(PARAMS.min_body_height) - 1e-9


def test_joy_exit_latches():
    cs = step_mod.controller_init(PARAMS, dtype=DTYPE)
    btn = np.zeros(8)
    btn[joy_mod.BUTTON_EXIT] = 1
    cs = joy_mod.joy_update(cs, _axes(), btn, 0.01, PARAMS)
    cs = joy_mod.joy_update(cs, _axes(), np.zeros(8), 0.01, PARAMS)
    assert bool(cs.joy.exit_flag)


def test_joy_velocity_scaling():
    cs = step_mod.controller_init(PARAMS, dtype=DTYPE)
    cs = joy_mod.joy_update(cs, _axes(velx=1.0, vely=-1.0, yaw=0.5),
                            np.zeros(8), 0.01, PARAMS)
    assert float(cs.joy.velx) == joy_mod.VELX_MAX
    assert float(cs.joy.vely) == -joy_mod.VELY_MAX
    np.testing.assert_allclose(float(cs.joy.yaw_rate),
                               0.5 * joy_mod.YAW_RATE_MAX)


# ---------- hardware index swap + protections ----------

def test_joint_swap_roundtrip():
    x = np.arange(12.0)
    np.testing.assert_array_equal(
        hw.unitree_to_internal_joints(hw.internal_to_unitree_joints(x)), x)


def test_joint_swap_semantics():
    """Unitree leg order FR,FL,RR,RL -> internal FL,FR,RL,RR: internal FL
    (leg 0) must read from SDK leg 1's slots (reference:
    HardwareInterface.cpp:27-28)."""
    x_unitree = np.arange(12.0)       # SDK: FR=0..2, FL=3..5, RR=6..8, RL=9..11
    x_int = hw.unitree_to_internal_joints(x_unitree)
    np.testing.assert_array_equal(x_int[0:3], [3, 4, 5])     # FL <- SDK FL
    np.testing.assert_array_equal(x_int[3:6], [0, 1, 2])     # FR <- SDK FR
    np.testing.assert_array_equal(x_int[6:9], [9, 10, 11])   # RL
    np.testing.assert_array_equal(x_int[9:12], [6, 7, 8])    # RR


def test_position_and_power_protect():
    q = np.tile([5.0, -5.0, 0.0], 4)
    qp = hw.position_protect(q)
    assert np.all(qp <= hw.Q_MAX) and np.all(qp >= hw.Q_MIN)
    tau = np.full(12, 100.0)
    np.testing.assert_allclose(hw.power_protect(tau, 10), 33.5)
    np.testing.assert_allclose(hw.power_protect(tau, 5), 16.75)


def test_moving_average_filter():
    f = hw._MovingAverage(4, 2)
    out = None
    for v in range(8):
        out = f.update(np.array([v, 2.0 * v]))
    np.testing.assert_allclose(out, [(4 + 5 + 6 + 7) / 4,
                                     2 * (4 + 5 + 6 + 7) / 4])


# ---------- mocap ----------

def test_mocap_frame_roundtrip():
    pos = np.array([1.0, 2.0, 0.5])
    quat = np.array([0.9238795, 0.0, 0.0, 0.3826834])   # 45 deg yaw
    pkt = mocap.build_frame([(7, pos, quat)], frame_number=42)
    bodies = mocap.parse_frame(pkt)
    assert len(bodies) == 1 and bodies[0].body_id == 7
    np.testing.assert_allclose(bodies[0].pos, pos, atol=1e-6)
    np.testing.assert_allclose(bodies[0].quat, quat, atol=1e-6)


def test_mocap_non_frame_ignored():
    assert mocap.parse_frame(b"\x05\x00\x00\x00junk") is None
    assert mocap.parse_frame(b"") is None


def test_mocap_pose_to_ekf_measurement_zup():
    rb = mocap.RigidBody(1, np.array([1.0, 2.0, 3.0]),
                         np.array([0.9238795, 0.0, 0.0, 0.3826834]))
    pos, eul = mocap.pose_to_ekf_measurement(rb, up_axis="z")
    np.testing.assert_allclose(pos, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(eul, [0.0, 0.0, np.pi / 4], atol=1e-6)


def test_mocap_yup_conversion():
    """Y-up pose of a level body 1 m off the ground -> z-up."""
    s = np.sqrt(0.5)
    # y-up "level" = rotated -90deg about x relative to z-up identity
    rb = mocap.RigidBody(1, np.array([2.0, 1.0, -3.0]),
                         np.array([s, -s, 0.0, 0.0]))
    pos, eul = mocap.pose_to_ekf_measurement(rb, up_axis="y")
    np.testing.assert_allclose(pos, [2.0, 3.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(eul, 0.0, atol=1e-6)


def test_mocap_multicast_loopback():
    """End-to-end: client receives a frame over loopback UDP."""
    import socket
    import time as _t

    client = mocap.MocapClient(multicast_group=None, port=0)
    port = client.sock.getsockname()[1]
    client.start()
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    pkt = mocap.build_frame([(3, np.array([0.1, 0.2, 0.3]),
                              np.array([1.0, 0.0, 0.0, 0.0]))])
    for _ in range(50):
        tx.sendto(pkt, ("127.0.0.1", port))
        if client.get_pose(3) is not None:
            break
        _t.sleep(0.02)
    rb = client.get_pose(3)
    client.close()
    tx.close()
    assert rb is not None
    np.testing.assert_allclose(rb.pos, [0.1, 0.2, 0.3], atol=1e-6)


# ---------- high-level bridge ----------

def test_highcmd_codec_roundtrip():
    cmd = hl.HighCmd(mode=2, gait_type=1, vx=0.4, vy=-0.1, yaw_rate=0.2,
                     body_height=0.02, foot_height=0.01)
    out = hl.decode_high_cmd(hl.encode_high_cmd(cmd))
    assert out is not None
    np.testing.assert_allclose([out.vx, out.vy, out.yaw_rate],
                               [0.4, -0.1, 0.2], atol=1e-6)
    assert out.mode == 2 and out.gait_type == 1


def test_highcmd_rejects_corruption():
    pkt = bytearray(hl.encode_high_cmd(hl.HighCmd()))
    pkt[6] ^= 0xFF
    assert hl.decode_high_cmd(bytes(pkt)) is None
    assert hl.decode_high_cmd(b"short") is None


def test_highlevel_bridge_transmits():
    import socket

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    bridge = hl.HighLevelBridge(peer=rx.getsockname(), rate_hz=200.0)
    bridge.set_cmd(vx=0.25, mode=2)
    bridge.start()
    data, _ = rx.recvfrom(256)
    bridge.close()
    rx.close()
    cmd = hl.decode_high_cmd(data)
    assert cmd is not None and abs(cmd.vx - 0.25) < 1e-6


# ---------- CLI ----------

def test_cli_sim_standing_smoke():
    out = subprocess.run(
        [sys.executable, "-m", "legged_mpc_control_tpu",
         "--robot", "a1", "--kf", "0", "--seconds", "0.3", "--cpu"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["upright"] and summary["final_height_m"] > 0.25


def test_cli_rejects_hardware_without_estimation():
    out = subprocess.run(
        [sys.executable, "-m", "legged_mpc_control_tpu",
         "--backend", "hardware", "--kf", "0", "--yes", "--cpu"],
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 1


# ---------- NatNet command-port protocol ----------

def test_mocap_server_info_roundtrip():
    pkt = mocap.build_server_info(app_name="Motive",
                                  app_version=(2, 3, 0, 0),
                                  natnet_version=(3, 1, 0, 0))
    info = mocap.parse_server_info(pkt)
    assert info.app_name == "Motive"
    assert info.app_version == (2, 3, 0, 0)
    assert info.natnet_version == (3, 1, 0, 0)
    # non-serverinfo rejected
    assert mocap.parse_server_info(mocap.build_connect()) is None


def test_mocap_model_def_roundtrip():
    model = mocap.ModelDef(
        marker_sets={"go1": ["m1", "m2", "m3"]},
        rigid_bodies=[
            mocap.RigidBodyDef("go1_trunk", 7, 0,
                               np.array([0.0, 0.1, 0.2])),
            mocap.RigidBodyDef("gate", 9, 0, np.zeros(3)),
        ],
        skeletons={"operator": [
            mocap.RigidBodyDef("hip", 1, 0, np.zeros(3)),
            mocap.RigidBodyDef("chest", 2, 1,
                               np.array([0.0, 0.0, 0.3]))]},
    )
    for ver in ((2, 6), (3, 0)):
        pkt = mocap.build_model_def(model, natnet_version=ver)
        got = mocap.parse_model_def(pkt, natnet_version=ver)
        assert got.marker_sets == {"go1": ["m1", "m2", "m3"]}
        assert [rb.name for rb in got.rigid_bodies] == ["go1_trunk", "gate"]
        assert got.rigid_bodies[0].body_id == 7
        np.testing.assert_allclose(got.rigid_bodies[0].offset,
                                   [0.0, 0.1, 0.2], atol=1e-6)
        assert [rb.name for rb in got.skeletons["operator"]] == [
            "hip", "chest"]
        assert got.body_id_for("gate") == 9
        assert got.body_id_for("nope") is None


def test_mocap_command_port_handshake():
    """Full client flow against the fake Motive server: Connect ->
    ServerInfo (versions learned), RequestModelDef -> ModelDef (IDs
    resolved), then a version-gated data frame (reference flow:
    mocap_node.cpp:86-99 initialize + run)."""
    import socket as _socket

    model = mocap.ModelDef({}, [mocap.RigidBodyDef(
        "trunk", 5, 0, np.zeros(3))], {})
    server = mocap.FakeMotiveServer(model, natnet_version=(3, 0, 0, 0))
    server.start()
    client = mocap.MocapClient(multicast_group=None, port=0,
                               server_ip="127.0.0.1",
                               command_port=server.port)
    try:
        info = client.connect(timeout=5.0)
        assert info.natnet_version[:2] == (3, 0)
        got = client.request_model_def(timeout=5.0)
        assert got.body_id_for("trunk") == 5
        client.start()
        tx = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
        pkt = mocap.build_frame(
            [(5, np.array([0.3, 0.0, 0.29]),
              np.array([1.0, 0.0, 0.0, 0.0]))], frame_number=1)
        dst = ("127.0.0.1", client.sock.getsockname()[1])
        # also a garbage datagram: counted as malformed, not fatal
        deadline = time.time() + 5.0
        while client.frames == 0 and time.time() < deadline:
            tx.sendto(b"\x07\x00\xff\xff\x01", dst)
            tx.sendto(pkt, dst)
            time.sleep(0.05)
        tx.close()
        assert client.frames > 0
        rb = client.get_pose(5)
        np.testing.assert_allclose(rb.pos, [0.3, 0.0, 0.29], atol=1e-6)
        assert client.malformed > 0
    finally:
        client.close()
        server.close()
