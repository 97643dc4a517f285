"""SO(3) utilities — quaternion / Euler / rotation-matrix conversions.

Functional JAX re-design of the reference's Eigen helpers
(reference: src/legged_ctrl/src/utils/Utils.cpp:7-106). All functions are
pure, shape-static, dtype-polymorphic, and `vmap`/`jit` friendly.

Conventions:
  * quaternions are arrays ``[w, x, y, z]`` (scalar first);
  * Euler angles are intrinsic roll-pitch-yaw ``[r, p, y]`` matching the
    reference's `quat_to_euler` (Utils.cpp:7-33);
  * rotation matrices are world-from-body.
"""

import jax.numpy as jnp


def quat_to_euler(q):
    """Quaternion [w,x,y,z] -> roll-pitch-yaw. reference: Utils.cpp:7-33."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    y_sqr = y * y
    t0 = 2.0 * (w * x + y * z)
    t1 = 1.0 - 2.0 * (x * x + y_sqr)
    roll = jnp.arctan2(t0, t1)
    t2 = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(t2)
    t3 = 2.0 * (w * z + x * y)
    t4 = 1.0 - 2.0 * (y_sqr + z * z)
    yaw = jnp.arctan2(t3, t4)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_to_quat(euler):
    """Roll-pitch-yaw -> quaternion [w,x,y,z]. reference: Utils.cpp:64-87."""
    hr, hp, hy = euler[..., 0] / 2, euler[..., 1] / 2, euler[..., 2] / 2
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    cp, sp = jnp.cos(hp), jnp.sin(hp)
    cr, sr = jnp.cos(hr), jnp.sin(hr)
    w = cy * cp * cr + sy * sp * sr
    x = cy * cp * sr - sy * sp * cr
    y = cy * sp * cr + sy * cp * sr
    z = sy * cp * cr - cy * sp * sr
    return jnp.stack([w, x, y, z], axis=-1)


def quat_to_rotmat(q):
    """Quaternion [w,x,y,z] -> rotation matrix (world-from-body)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ], axis=-2)
    return r


def skew(v):
    """3-vector -> skew-symmetric matrix. reference: Utils.cpp:89-95."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
    ], axis=-2)


def rot_z(yaw):
    """Rotation about +z by `yaw` (world-from-body yaw-only rotation).

    reference: BaseInterface.cpp:219 (root_rot_mat_z).
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, zero], axis=-1),
        jnp.stack([s, c, zero], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ], axis=-2)


def angvel_to_rpy_rate(yaw):
    """Small-roll/pitch map from world angular velocity to rpy rates.

    The yaw-only linearization used by the MPC dynamics
    (reference: ConvexQPSolver.cpp:214-228):
        [[ cos,  sin, 0],
         [-sin,  cos, 0],
         [   0,    0, 1]]
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, s, zero], axis=-1),
        jnp.stack([-s, c, zero], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ], axis=-2)


def euler_zyx_rates_from_omega_world(yaw, pitch, omega_world):
    """Exact ZYX euler-angle rates [dyaw, dpitch, droll] from the world
    angular velocity (reference: wbc.cpp:53-55 uses OCS2's
    getEulerAnglesZyxDerivativesFromGlobalAngularVelocity).

    omega_world = T(yaw, pitch) @ rates with
        T = [[0, -sin(yaw), cos(yaw)cos(pitch)],
             [0,  cos(yaw), sin(yaw)cos(pitch)],
             [1,  0,        -sin(pitch)       ]]
    (columns: yaw about world z, pitch about the yawed y, roll about the
    yawed+pitched x). Singular at pitch = +-pi/2 (gimbal lock), like the
    reference's own mapping."""
    sy, cy = jnp.sin(yaw), jnp.cos(yaw)
    sp, cp = jnp.sin(pitch), jnp.cos(pitch)
    z = jnp.zeros_like(sy)
    o = jnp.ones_like(sy)
    T = jnp.stack([
        jnp.stack([z, -sy, cy * cp], axis=-1),
        jnp.stack([z, cy, sy * cp], axis=-1),
        jnp.stack([o, z, -sp], axis=-1),
    ], axis=-2)
    from legged_mpc_control_tpu.ops import la3

    return la3.solve3(T, omega_world)


def quat_mul(q1, q2):
    """Hamilton product of quaternions [w,x,y,z]."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_integrate(q, omega_world, dt):
    """Integrate a unit quaternion under world-frame angular velocity.

    Exponential-map integration (exact for constant omega over dt); used by
    the on-device SRB simulator (the reference relies on Gazebo for this).
    """
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    half = 0.5 * angle * dt
    # sinc-safe axis*sin(half)
    small = angle < 1e-8
    scale = jnp.where(small, 0.5 * dt, jnp.sin(half) / jnp.where(small, 1.0, angle))
    dq = jnp.concatenate([jnp.cos(half), omega_world * scale], axis=-1)
    out = quat_mul(dq, q)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)
