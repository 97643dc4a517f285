"""OptiTrack/NatNet motion-capture adapter.

Re-design of the reference's `mocap_optitrack` package (reference:
src/mocap_optitrack/ — a NatNet UDP-multicast client that publishes each
rigid body's pose, consumed by `HardwareInterface::opti_callback` to correct
the EKF, HardwareInterface.cpp:203-228; multicast 224.0.0.1, data port 9000,
command port 1510 per config/mocap.yaml:20-24).

Implemented:
  * `parse_frame` — a NatNet "FrameOfData" (MessageID 7) parser covering the
    rigid-body section (ID, position, orientation quaternion) for the packet
    layout NatNet >= 3.0 streams when marker data is not requested, plus the
    marker-set/other-marker skip logic needed to reach it.
  * `MocapClient` — a multicast receiver thread producing the latest pose
    per rigid body.
  * `pose_to_ekf_measurement` — the coordinate fix-up into [pos, euler] for
    `estimation.ekf.ekf_update_with_opti` (the reference applies the
    equivalent transform in rigid_body_publisher.cpp).
"""

import socket
import struct
import threading
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

NAT_FRAMEOFDATA = 7


class RigidBody(NamedTuple):
    body_id: int
    pos: np.ndarray      # (3,)
    quat: np.ndarray     # (4,) [w,x,y,z] (NatNet streams x,y,z,w)


def build_frame(bodies: List[Tuple[int, np.ndarray, np.ndarray]],
                frame_number: int = 0) -> bytes:
    """Serialize a minimal FrameOfData (no marker sets / labeled markers) —
    used by tests and by the HIL fake server; byte-layout-compatible with
    what `parse_frame` consumes."""
    payload = struct.pack("<i", frame_number)
    payload += struct.pack("<i", 0)          # nMarkerSets
    payload += struct.pack("<i", 0)          # nOtherMarkers
    payload += struct.pack("<i", len(bodies))
    for body_id, pos, quat in bodies:
        w, x, y, z = quat
        payload += struct.pack("<i", body_id)
        payload += struct.pack("<3f", *pos)
        payload += struct.pack("<4f", x, y, z, w)
        payload += struct.pack("<f", 0.0)    # mean marker error
        payload += struct.pack("<h", 1)      # params: tracking valid
    return struct.pack("<HH", NAT_FRAMEOFDATA, len(payload)) + payload


def parse_frame(data: bytes) -> Optional[List[RigidBody]]:
    """Extract rigid bodies from a FrameOfData packet. Returns None for
    non-frame messages. Unknown trailing sections (skeletons, labeled
    markers, timing) are ignored — the reference client likewise only
    publishes the rigid-body section."""
    if len(data) < 4:
        return None
    msg_id, _nbytes = struct.unpack_from("<HH", data, 0)
    if msg_id != NAT_FRAMEOFDATA:
        return None
    off = 4
    off += 4                                            # frame number
    (n_marker_sets,) = struct.unpack_from("<i", data, off)
    off += 4
    for _ in range(n_marker_sets):
        end = data.index(b"\0", off)                    # set name (cstr)
        off = end + 1
        (n_markers,) = struct.unpack_from("<i", data, off)
        off += 4 + 12 * n_markers
    (n_other,) = struct.unpack_from("<i", data, off)
    off += 4 + 12 * n_other
    (n_bodies,) = struct.unpack_from("<i", data, off)
    off += 4
    bodies = []
    for _ in range(n_bodies):
        body_id, px, py, pz, qx, qy, qz, qw = struct.unpack_from(
            "<i7f", data, off)
        off += 32
        # mean error + params (present in >=2.6 streams)
        if off + 6 <= len(data):
            off += 6
        bodies.append(RigidBody(
            body_id=body_id,
            pos=np.array([px, py, pz]),
            quat=np.array([qw, qx, qy, qz])))
    return bodies


def pose_to_ekf_measurement(rb: RigidBody, up_axis: str = "z"):
    """NatNet pose -> (pos (3,), euler rpy (3,)) for the EKF's mocap update.

    OptiTrack default streams Y-up; the robot frame is Z-up (the reference's
    publisher applies this rotation, mocap_optitrack rigid_body_publisher).
    """
    pos = rb.pos.copy()
    w, x, y, z = rb.quat
    if up_axis == "y":
        # rotate -90 deg about X: (x,y,z)_yup -> (x, -z, y)_zup
        pos = np.array([pos[0], -pos[2], pos[1]])
        # q_zup = r * q_yup with r = rot_x(+90deg) = (cos45, sin45, 0, 0)
        s = np.sqrt(0.5)
        w, x, y, z = (s * w - s * x, s * x + s * w,
                      s * y - s * z, s * z + s * y)
    # quat -> ZYX euler (same convention as ops/so3.quat_to_euler)
    sinr = 2 * (w * x + y * z)
    cosr = 1 - 2 * (x * x + y * y)
    roll = np.arctan2(sinr, cosr)
    sinp = np.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = np.arcsin(sinp)
    siny = 2 * (w * z + x * y)
    cosy = 1 - 2 * (y * y + z * z)
    yaw = np.arctan2(siny, cosy)
    return pos, np.array([roll, pitch, yaw])


class MocapClient:
    """Background multicast receiver; keeps the latest pose per body
    (reference topology: mocap.yaml multicast 224.0.0.1:9000)."""

    def __init__(self, multicast_group="224.0.0.1", port=9000,
                 iface_ip="0.0.0.0"):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind((iface_ip, port))
        if multicast_group:
            mreq = (socket.inet_aton(multicast_group)
                    + socket.inet_aton(iface_ip))
            self.sock.setsockopt(socket.IPPROTO_IP,
                                 socket.IP_ADD_MEMBERSHIP, mreq)
        self.sock.settimeout(0.2)
        self.latest: Dict[int, RigidBody] = {}
        self.frames = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()

    def _run(self):
        while not self._stop.is_set():
            try:
                data, _ = self.sock.recvfrom(65535)
            except socket.timeout:
                continue
            except OSError:
                break
            bodies = parse_frame(data)
            if bodies:
                for rb in bodies:
                    self.latest[rb.body_id] = rb
                self.frames += 1

    def get_pose(self, body_id: int) -> Optional[RigidBody]:
        return self.latest.get(body_id)

    def close(self):
        self._stop.set()
        self.sock.close()
        if self._thread.is_alive():
            self._thread.join(timeout=1.0)
