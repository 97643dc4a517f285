"""Native C++ components: QP oracle parity + realtime UDP loop."""

import socket
import time

import numpy as np
import pytest

from legged_mpc_control_tpu import native


def test_native_oracle_matches_python_oracle():
    """The C++ oracle must agree with the python test oracle on a reference
    MPC QP (both qpOASES-stand-ins, independent implementations)."""
    import jax.numpy as jnp

    from legged_mpc_control_tpu.config import go1_params
    from legged_mpc_control_tpu.mpc import qp_builder
    import test_qp as T
    from oracle import solve_qp_oracle

    params = go1_params(jnp.float64)
    H = 10
    contact = np.zeros((H, 4))
    contact[:5, [0, 3]] = 1.0
    contact[5:, [1, 2]] = 1.0
    x0 = np.zeros(12)
    x0[5] = 0.3
    x0[9] = 0.4
    x0j, x_ref, A_seq, B, c = T.make_problem(params, H, contact, x0,
                                             vel_cmd=(0.4, 0.0, 0.0))
    qw = params.q_weights.astype(jnp.float64)
    rw = params.r_weights.astype(jnp.float64)
    Hs, g, Ac, lb, ub = qp_builder.reference_sparse_qp(
        x0j, x_ref, A_seq, B, contact, qw, rw, params.mu, params.fz_max,
        T.DT)
    # clamp infinities for the C side (same convention as reference INFTY)
    lb = np.clip(lb, -1e20, 1e20)
    ub = np.clip(ub, -1e20, 1e20)

    x_py = solve_qp_oracle(Hs, g, Ac, lb, ub)
    x_c = native.qp_oracle_solve(Hs, g, Ac, lb, ub)
    np.testing.assert_allclose(x_c, x_py, atol=1e-6)


def test_packet_codec_roundtrip():
    quat = np.array([1.0, 0, 0, 0], np.float32)
    gyro = np.array([0.1, -0.2, 0.3], np.float32)
    acc = np.array([0.0, 0.0, 9.81], np.float32)
    q = np.arange(12, dtype=np.float32) * 0.1
    pkt = native.encode_state_packet(quat, gyro, acc, q, q * 2, q * 3,
                                     np.ones(4, np.float32) * 50, seq=7)
    assert len(pkt) > 100
    # corrupting a byte must fail CRC on decode of a cmd... use cmd decode on
    # garbage: wrong magic
    try:
        native.decode_cmd_packet(pkt)      # state packet into cmd decoder
        assert False
    except RuntimeError:
        pass


def test_realtime_loop_against_fake_robot():
    """End-to-end over loopback UDP: a fake robot (python socket) sends
    state packets; the native loop ingests them, exposes snapshots through
    the seqlock, and transmits the latest pushed command back at the loop
    rate."""
    robot = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    robot.bind(("127.0.0.1", 0))
    robot.settimeout(2.0)
    robot_port = robot.getsockname()[1]

    rt = native.Runtime(bind_ip="127.0.0.1", bind_port=0, period_s=0.002)
    # learn the runtime's port by sending from the robot after rt starts
    rt.start()
    try:
        # need the runtime's bound port: bind_port=0 means ephemeral; we
        # didn't expose it, so instead have the runtime address the robot
        rt.set_peer("127.0.0.1", robot_port)
        q = np.linspace(0, 1.1, 12).astype(np.float32)
        rt.push_cmd(q, q * 0, q * 0 + 5.0, q * 0 + 0.5, q * 0)

        # feed a state packet (robot -> runtime): we must know the
        # runtime's socket... the runtime replies to the configured peer,
        # so just wait for a command packet to learn its address
        data, rt_addr = robot.recvfrom(2048)
        cmd = native.decode_cmd_packet(data)
        np.testing.assert_allclose(cmd["q"], q, atol=1e-6)
        assert cmd["kp"][0] == 5.0

        # now send state to the runtime and read it back via the seqlock
        quat = np.array([1, 0, 0, 0], np.float32)
        pkt = native.encode_state_packet(
            quat, np.zeros(3, np.float32),
            np.array([0, 0, 9.81], np.float32),
            q, q * 0.5, q * 0.1, np.full(4, 60.0, np.float32), seq=3)
        robot.sendto(pkt, rt_addr)
        time.sleep(0.05)
        state = rt.get_state()
        assert state is not None
        np.testing.assert_allclose(state["q"], q, atol=1e-6)
        np.testing.assert_allclose(state["foot_force"], 60.0, atol=1e-6)

        time.sleep(0.2)
        stats = rt.stats()
        assert stats["iterations"] > 50          # ~500 Hz loop ran
        assert stats["tx_packets"] > 50
        assert stats["rx_packets"] >= 1
        assert stats["crc_errors"] == 0
    finally:
        rt.stop()
        rt.close()
        robot.close()
