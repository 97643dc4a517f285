"""Floating-base whole-body dynamics for A1/Go1-class quadrupeds.

The reference's WBC pulls mass matrix / nonlinear effects / frame Jacobians
from Pinocchio + OCS2 (reference: src/wbc_ctrl/wbc.cpp:59-91). Here the same
quantities are *derived by automatic differentiation* from one forward-
kinematics function — the idiomatic JAX replacement for hand-written
CRBA/RNEA recursions: kinetic energy is evaluated exactly with `jax.jvp`
through FK, the mass matrix is its velocity Hessian, and the bias forces
follow from the Euler-Lagrange identity

    nle(q, v) = d/dt (M v) - grad_q KE + grad_q PE .

Generalized coordinates q (18,) = [base pos(3), euler ZYX (yaw,pitch,roll),
joint angles(12 in FL,FR,RL,RR x HAA,HFE,KFE order)] with v = dq/dt — the
same floating-base parameterization the reference feeds its WBC
(reference: BaseInterface.cpp:512-518, ZYX euler + euler-rate velocities).

Link masses / COMs / inertias follow the A1 URDF
(reference: urdf/a1_description/urdf/a1/const.xacro).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from legged_mpc_control_tpu.constants import GRAVITY_EST

N_Q = 18
N_JOINTS = 12
# URDF leg geometry (const.xacro; note the dynamics model uses the URDF's
# 0.2 m thigh/calf, while the controller's analytic leg kinematics uses the
# reference's hard-coded 0.21 m — we reproduce both inconsistently-consistent
# values faithfully)
LEG_OFFSET_X = 0.1805
LEG_OFFSET_Y = 0.047
THIGH_OFFSET = 0.0838
THIGH_LEN = 0.2
CALF_LEN = 0.2


class WbModel(NamedTuple):
    """Constant model data (built once, then closed over by jitted fns)."""
    trunk_mass: np.ndarray
    trunk_com: np.ndarray           # (3,)
    trunk_inertia: np.ndarray       # (3,3) about COM, trunk frame
    hip_origin: np.ndarray          # (4,3) in trunk frame
    hfe_origin: np.ndarray          # (4,3) in hip frame
    kfe_origin: np.ndarray          # (4,3) in thigh frame
    foot_origin: np.ndarray         # (4,3) in calf frame
    link_mass: np.ndarray           # (4,3) hip/thigh/calf(+foot lumped)
    link_com: np.ndarray            # (4,3,3) COM in link frame
    link_inertia: np.ndarray        # (4,3,3,3) about COM, link frame


def _mirrored_inertia(ixx, ixy, ixz, iyy, iyz, izz, mirror, front):
    return np.array([
        [ixx, ixy * mirror * front, ixz * front],
        [ixy * mirror * front, iyy, iyz * mirror],
        [ixz * front, iyz * mirror, izz],
    ])


def a1_wb_model() -> WbModel:
    """A1 link parameters. reference: urdf/a1/const.xacro."""
    mirrors = [1.0, -1.0, 1.0, -1.0]       # FL, FR, RL, RR
    fronts = [1.0, 1.0, -1.0, -1.0]

    hip_origin, hfe_origin = [], []
    link_com, link_inertia, link_mass = [], [], []
    for m, f in zip(mirrors, fronts):
        hip_origin.append([LEG_OFFSET_X * f, LEG_OFFSET_Y * m, 0.0])
        hfe_origin.append([0.0, THIGH_OFFSET * m, 0.0])
        hip_com = [-0.003875 * f, 0.001622 * m, 0.000042]
        thigh_com = [-0.003574, -0.019529 * m, -0.030323]
        # foot (0.06 kg) lumped into the calf as a point mass at the foot
        calf_m, foot_m = 0.151, 0.06
        calf_com_own = np.array([0.007105, -0.000239 * m, -0.096933])
        foot_pos = np.array([0.0, 0.0, -CALF_LEN])
        lumped_m = calf_m + foot_m
        calf_com = (calf_m * calf_com_own + foot_m * foot_pos) / lumped_m
        link_com.append([hip_com, thigh_com, list(calf_com)])
        link_mass.append([0.595, 0.888, lumped_m])
        hip_I = _mirrored_inertia(0.000402747, -0.000008709, -0.000000297,
                                  0.000691123, -0.000000545, 0.000487919,
                                  m, f)
        thigh_I = _mirrored_inertia(0.005251806, -0.000002168, 0.000346889,
                                    0.005000475, -0.000028174, 0.001110200,
                                    m, 1.0)
        calf_I_own = _mirrored_inertia(0.002344758, 0.0, -0.000141275,
                                       0.002360755, 0.0, 0.000031158,
                                       m, 1.0)
        # parallel-axis shift of calf + foot point mass to the lumped COM
        def shift(I, mass, r):
            r = np.asarray(r)
            return I + mass * (np.dot(r, r) * np.eye(3) - np.outer(r, r))
        calf_I = (shift(calf_I_own, calf_m, calf_com_own - calf_com)
                  + shift(np.zeros((3, 3)), foot_m, foot_pos - calf_com))
        link_inertia.append([hip_I, thigh_I, calf_I])

    return WbModel(
        trunk_mass=np.array(6.0),
        trunk_com=np.array([0.0, 0.0041, -0.0005]),
        trunk_inertia=np.array([
            [0.0158533, -0.0000366, -0.0000611],
            [-0.0000366, 0.0377999, -0.0000275],
            [-0.0000611, -0.0000275, 0.0456542]]),
        hip_origin=np.array(hip_origin),
        hfe_origin=np.array(hfe_origin),
        kfe_origin=np.tile([0.0, 0.0, -THIGH_LEN], (4, 1)),
        foot_origin=np.tile([0.0, 0.0, -CALF_LEN], (4, 1)),
        link_mass=np.array(link_mass),
        link_com=np.array(link_com),
        link_inertia=np.array(link_inertia),
    )


def go1_wb_model() -> WbModel:
    """Go1 link parameters. reference: urdf/go1_description/xacro/const.xacro
    with the per-leg mirroring conventions of xacro/leg.xacro:48-171
    (hip COM/products mirrored in y and x, thigh in y, calf unmirrored;
    0.06 kg foot sphere lumped into the calf as in `a1_wb_model`).

    Geometry: leg_offset (0.1881, 0.04675), thigh_offset 0.08,
    thigh/calf length 0.213 (const.xacro:17-21)."""
    mirrors = [1.0, -1.0, 1.0, -1.0]       # FL, FR, RL, RR
    fronts = [1.0, 1.0, -1.0, -1.0]
    leg_off_x, leg_off_y = 0.1881, 0.04675
    thigh_off, thigh_len, calf_len = 0.08, 0.213, 0.213

    hip_origin, hfe_origin = [], []
    link_com, link_inertia, link_mass = [], [], []
    for m, f in zip(mirrors, fronts):
        hip_origin.append([leg_off_x * f, leg_off_y * m, 0.0])
        hfe_origin.append([0.0, thigh_off * m, 0.0])
        hip_com = [-0.00541 * f, -0.00074 * m, 0.000006]
        thigh_com = [-0.003468, -0.018947 * m, -0.032736]
        calf_m, foot_m = 0.131, 0.06
        calf_com_own = np.array([0.006286, 0.001307, -0.122269])
        foot_pos = np.array([0.0, 0.0, -calf_len])
        lumped_m = calf_m + foot_m
        calf_com = (calf_m * calf_com_own + foot_m * foot_pos) / lumped_m
        link_com.append([hip_com, thigh_com, list(calf_com)])
        link_mass.append([0.591, 0.92, lumped_m])
        hip_I = _mirrored_inertia(0.000374268192, 0.000036844422,
                                  -0.000000986754, 0.000635923669,
                                  -0.000001172894, 0.000457647394, m, f)
        thigh_I = _mirrored_inertia(0.005851561134, 0.000001783284,
                                    0.000328291374, 0.005596155105,
                                    0.000021430713, 0.00107157026, m, 1.0)
        calf_I_own = _mirrored_inertia(0.002939186297, 0.000001440899,
                                       -0.000105359550, 0.00295576935,
                                       -0.000024397752, 0.000030273372,
                                       1.0, 1.0)

        def shift(I, mass, r):
            r = np.asarray(r)
            return I + mass * (np.dot(r, r) * np.eye(3) - np.outer(r, r))
        # foot sphere's own inertia 2/5 m r^2 (leg.xacro:168-170)
        foot_I = np.eye(3) * (0.4 * foot_m * 0.02 ** 2)
        calf_I = (shift(calf_I_own, calf_m, calf_com_own - calf_com)
                  + shift(foot_I, foot_m, foot_pos - calf_com))
        link_inertia.append([hip_I, thigh_I, calf_I])

    return WbModel(
        trunk_mass=np.array(5.204),
        trunk_com=np.array([0.0223, 0.002, -0.0005]),
        trunk_inertia=np.array([
            [0.0168352186, 0.0004636141, 0.0002367952],
            [0.0004636141, 0.0656071082, 0.000036671],
            [0.0002367952, 0.000036671, 0.0742720659]]),
        hip_origin=np.array(hip_origin),
        hfe_origin=np.array(hfe_origin),
        kfe_origin=np.tile([0.0, 0.0, -thigh_len], (4, 1)),
        foot_origin=np.tile([0.0, 0.0, -calf_len], (4, 1)),
        link_mass=np.array(link_mass),
        link_com=np.array(link_com),
        link_inertia=np.array(link_inertia),
    )


def wb_model_for(robot: str) -> WbModel:
    """Whole-body model by robot name — the config-tier selector the
    reference drives with /robot_type (reference: main.cpp:36-44)."""
    if robot == "a1":
        return a1_wb_model()
    if robot == "go1":
        return go1_wb_model()
    raise ValueError(f"unknown robot {robot!r}")


def _rx(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[1., 0., 0.], [0., c, -s], [0., s, c]])


def _ry(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, 0., s], [0., 1., 0.], [-s, 0., c]])


def _rz(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, -s, 0.], [s, c, 0.], [0., 0., 1.]])


def base_rot(q):
    """World-from-base rotation from ZYX euler (yaw, pitch, roll)."""
    return _rz(q[3]) @ _ry(q[4]) @ _rx(q[5])


def body_frames(q, model: WbModel):
    """World rotation + world COM position of all 13 bodies.

    Returns (R (13,3,3), p_com (13,3), p_foot (4,3)). Body order:
    trunk, then per leg [hip, thigh, calf]."""
    pos = q[0:3]
    Rb = base_rot(q)
    Rs = [Rb]
    ps = [pos + Rb @ jnp.asarray(model.trunk_com, q.dtype)]
    feet = []
    qj = q[6:18].reshape(4, 3)
    for leg in range(4):
        R_hip = Rb @ _rx(qj[leg, 0])
        p_hip_j = pos + Rb @ jnp.asarray(model.hip_origin[leg], q.dtype)
        R_thigh = R_hip @ _ry(qj[leg, 1])
        p_hfe = p_hip_j + R_hip @ jnp.asarray(model.hfe_origin[leg], q.dtype)
        R_calf = R_thigh @ _ry(qj[leg, 2])
        p_kfe = p_hfe + R_thigh @ jnp.asarray(model.kfe_origin[leg], q.dtype)
        p_foot = p_kfe + R_calf @ jnp.asarray(model.foot_origin[leg],
                                              q.dtype)
        for R_l, p_j, ci in ((R_hip, p_hip_j, 0), (R_thigh, p_hfe, 1),
                             (R_calf, p_kfe, 2)):
            Rs.append(R_l)
            ps.append(p_j + R_l @ jnp.asarray(model.link_com[leg][ci],
                                              q.dtype))
        feet.append(p_foot)
    return jnp.stack(Rs), jnp.stack(ps), jnp.stack(feet)


def _body_masses_inertias(model: WbModel, dtype):
    masses = jnp.concatenate([
        jnp.asarray([model.trunk_mass], dtype),
        jnp.asarray(model.link_mass, dtype).reshape(-1)])
    inertias = jnp.concatenate([
        jnp.asarray(model.trunk_inertia, dtype)[None],
        jnp.asarray(model.link_inertia, dtype).reshape(-1, 3, 3)])
    return masses, inertias


def kinetic_energy(q, v, model: WbModel):
    """Exact KE via jvp through FK (angular velocity from R_dot R^T)."""
    masses, inertias = _body_masses_inertias(model, q.dtype)

    def frames(qq):
        R, p, _ = body_frames(qq, model)
        return R, p

    (R, p), (dR, dp) = jax.jvp(frames, (q,), (v,))
    # omega (world) from skew(omega) = dR R^T
    W = jnp.einsum("bij,bkj->bik", dR, R)
    omega = jnp.stack([W[:, 2, 1], W[:, 0, 2], W[:, 1, 0]], axis=-1)
    I_world = jnp.einsum("bij,bjk,blk->bil", R, inertias, R)
    ke_lin = 0.5 * jnp.sum(masses * jnp.sum(dp * dp, axis=-1))
    ke_ang = 0.5 * jnp.sum(jnp.einsum("bi,bij,bj->b", omega, I_world, omega))
    return ke_lin + ke_ang


def potential_energy(q, model: WbModel):
    masses, _ = _body_masses_inertias(model, q.dtype)
    _, p, _ = body_frames(q, model)
    return GRAVITY_EST * jnp.sum(masses * p[:, 2])


def mass_matrix(q, model: WbModel):
    """M(q) (18,18): velocity Hessian of the kinetic energy."""
    return jax.jacfwd(jax.grad(kinetic_energy, argnums=1), argnums=1)(
        q, jnp.zeros_like(q), model)


def nonlinear_effects(q, v, model: WbModel):
    """nle(q,v) = C(q,v)v + g(q) via the Euler-Lagrange identity."""
    mom = jax.grad(kinetic_energy, argnums=1)       # p(q,v) = M(q) v

    def mom_q(qq):
        return mom(qq, v, model)

    _, dmom = jax.jvp(mom_q, (q,), (v,))            # d/dt (M v)
    dke_dq = jax.grad(kinetic_energy, argnums=0)(q, v, model)
    dpe_dq = jax.grad(potential_energy, argnums=0)(q, model)
    return dmom - dke_dq + dpe_dq


def foot_positions(q, model: WbModel):
    _, _, feet = body_frames(q, model)
    return feet


def foot_jacobians(q, model: WbModel):
    """J (4,3,18): world foot velocity = J @ v."""
    return jax.jacfwd(foot_positions)(q, model)


def foot_jdot_v(q, v, model: WbModel):
    """Jdot(q,v) @ v (4,3) — the drift term of the contact constraint."""

    def jv(qq):
        return jnp.einsum("lij,j->li", foot_jacobians(qq, model), v)

    _, out = jax.jvp(jv, (q,), (v,))
    return out


def com_position(q, model: WbModel):
    masses, _ = _body_masses_inertias(model, q.dtype)
    _, p, _ = body_frames(q, model)
    return jnp.einsum("b,bi->i", masses, p) / jnp.sum(masses)
