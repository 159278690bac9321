"""Cross-check the URDF loader + rigid-body dynamics against MuJoCo.

VERDICT.md round 1 missing #4: the dynamics core had FD/energy oracles but
no validation against a trusted independent library on a real URDF. MuJoCo
(shipped in the image) parses the same URDF text; we compare FK, the mass
matrix, the nonlinear term h(q, qd) and inverse dynamics on a nontrivial
7-DoF arm with rotated joint frames, mixed axes, and off-diagonal inertias.
"""
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from qppvm_tpu.model import dynamics, kinematics  # noqa: E402
from qppvm_tpu.model.robot import RobotState  # noqa: E402
from qppvm_tpu.model.urdf import load_urdf  # noqa: E402

DT = jnp.float64

# 7-DoF fixed-base arm: rotated joint origins (rpy), mixed axes, COM offsets
# in all coordinates, full inertia tensors with off-diagonals. NOTE: no
# inertial-origin rpy — MuJoCo's URDF importer silently IGNORES the inertial
# frame rotation (verified against the analytic parallel-axis value, see
# test_inertial_origin_rotation_honored below), so rotated inertials cannot
# be cross-checked against it.
URDF_ARM = """
<robot name="xarm">
  <link name="base"/>
  <link name="s1"><inertial>
    <origin xyz="0.02 -0.01 0.11"/><mass value="3.1"/>
    <inertia ixx="0.031" iyy="0.027" izz="0.012" ixy="0.002" ixz="-0.001" iyz="0.003"/>
  </inertial></link>
  <link name="s2"><inertial>
    <origin xyz="-0.01 0.03 0.14"/><mass value="2.4"/>
    <inertia ixx="0.022" iyy="0.019" izz="0.008" ixy="-0.001" ixz="0.002" iyz="0.001"/>
  </inertial></link>
  <link name="s3"><inertial>
    <origin xyz="0.015 0.0 0.12"/><mass value="1.9"/>
    <inertia ixx="0.015" iyy="0.014" izz="0.005" ixy="0.001" ixz="0" iyz="-0.002"/>
  </inertial></link>
  <link name="s4"><inertial>
    <origin xyz="0 0.02 0.1"/><mass value="1.4"/>
    <inertia ixx="0.009" iyy="0.008" izz="0.003" ixy="0" ixz="0.001" iyz="0"/>
  </inertial></link>
  <link name="s5"><inertial>
    <origin xyz="0.01 0 0.08"/><mass value="0.9"/>
    <inertia ixx="0.004" iyy="0.004" izz="0.002" ixy="0" ixz="0" iyz="0.001"/>
  </inertial></link>
  <link name="s6"><inertial>
    <origin xyz="0 -0.01 0.06"/><mass value="0.6"/>
    <inertia ixx="0.002" iyy="0.002" izz="0.001" ixy="0" ixz="0" iyz="0"/>
  </inertial></link>
  <link name="s7"><inertial>
    <origin xyz="0 0 0.04"/><mass value="0.3"/>
    <inertia ixx="0.001" iyy="0.001" izz="0.0005" ixy="0" ixz="0" iyz="0"/>
  </inertial></link>
  <joint name="q1" type="revolute"><parent link="base"/><child link="s1"/>
    <origin xyz="0 0 0.15"/><axis xyz="0 0 1"/>
    <limit lower="-3" upper="3" effort="150" velocity="4"/></joint>
  <joint name="q2" type="revolute"><parent link="s1"/><child link="s2"/>
    <origin xyz="0.05 0 0.22" rpy="0.3 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-2.2" upper="2.2" effort="150" velocity="4"/></joint>
  <joint name="q3" type="revolute"><parent link="s2"/><child link="s3"/>
    <origin xyz="0 0.04 0.28" rpy="0 -0.2 0.1"/><axis xyz="1 0 0"/>
    <limit lower="-2.8" upper="2.8" effort="100" velocity="5"/></joint>
  <joint name="q4" type="revolute"><parent link="s3"/><child link="s4"/>
    <origin xyz="0.03 0 0.24"/><axis xyz="0 1 0"/>
    <limit lower="-2.5" upper="2.5" effort="80" velocity="5"/></joint>
  <joint name="q5" type="revolute"><parent link="s4"/><child link="s5"/>
    <origin xyz="0 0 0.2" rpy="0.1 0.1 0"/><axis xyz="0 0 1"/>
    <limit lower="-3" upper="3" effort="40" velocity="6"/></joint>
  <joint name="q6" type="revolute"><parent link="s5"/><child link="s6"/>
    <origin xyz="0 0.02 0.16"/><axis xyz="0 1 0"/>
    <limit lower="-2" upper="2" effort="25" velocity="6"/></joint>
  <joint name="q7" type="revolute"><parent link="s6"/><child link="s7"/>
    <origin xyz="0 0 0.12"/><axis xyz="1 0 0"/>
    <limit lower="-2.8" upper="2.8" effort="12" velocity="8"/></joint>
</robot>
"""


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    model = load_urdf(URDF_ARM)
    p = tmp_path_factory.mktemp("urdf") / "xarm.urdf"
    p.write_text(URDF_ARM)
    mj = mujoco.MjModel.from_xml_path(str(p))
    return model, mj


def _mj_state(mj, q, qd):
    d = mujoco.MjData(mj)
    d.qpos[:] = np.asarray(q)
    d.qvel[:] = np.asarray(qd)
    mujoco.mj_forward(mj, d)
    return d


def _rand(model, seed, vel=True):
    rng = np.random.default_rng(seed)
    q = rng.uniform(-1.0, 1.0, model.nj)
    qd = rng.uniform(-1.0, 1.0, model.nj) if vel else np.zeros(model.nj)
    return q, qd


def test_joint_order_matches(pair):
    model, mj = pair
    mj_names = [mj.joint(i).name for i in range(mj.njnt)]
    assert list(model.joint_names) == mj_names


def test_fk_matches_mujoco(pair):
    model, mj = pair
    q, qd = _rand(model, 0)
    d = _mj_state(mj, q, qd)
    kin = kinematics.fk(model, RobotState.init(model, q=q, dtype=DT))
    for li, name in enumerate(model.link_names):
        bid = mj.body(name).id
        np.testing.assert_allclose(np.asarray(kin.p[li]), d.xpos[bid],
                                   atol=1e-6, err_msg=name)
        np.testing.assert_allclose(np.asarray(kin.R[li]),
                                   d.xmat[bid].reshape(3, 3), atol=1e-6,
                                   err_msg=name)


def test_mass_matrix_matches_mujoco(pair):
    model, mj = pair
    for seed in range(3):
        q, qd = _rand(model, seed)
        d = _mj_state(mj, q, qd)
        M_mj = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, M_mj)
        B = np.asarray(dynamics.mass_matrix(
            model, RobotState.init(model, q=q, dtype=DT)))
        np.testing.assert_allclose(B, M_mj, atol=1e-7)


def test_nonlinear_term_matches_mujoco(pair):
    """h(q, qd) = C qd + g == MuJoCo qfrc_bias (gravity + coriolis)."""
    model, mj = pair
    for seed in range(3):
        q, qd = _rand(model, seed)
        d = _mj_state(mj, q, qd)
        h = np.asarray(dynamics.nonlinear_term(
            model, RobotState.init(model, q=q, qd=qd, dtype=DT)))
        np.testing.assert_allclose(h, d.qfrc_bias, atol=1e-7)


def test_inverse_dynamics_matches_mujoco(pair):
    model, mj = pair
    rng = np.random.default_rng(7)
    for seed in range(3):
        q, qd = _rand(model, seed)
        qdd = rng.uniform(-2.0, 2.0, model.nj)
        d = _mj_state(mj, q, qd)
        d.qacc[:] = qdd
        mujoco.mj_inverse(mj, d)
        tau = np.asarray(dynamics.rnea(
            model, RobotState.init(model, q=q, qd=qd, dtype=DT),
            jnp.asarray(qdd, DT), gravity=True))
        np.testing.assert_allclose(tau, d.qfrc_inverse, atol=1e-7)


def test_inertial_origin_rotation_honored():
    """Our loader rotates the inertia tensor by the inertial-frame rpy (the
    URDF spec; MuJoCo's URDF importer ignores it). Analytic check: M[0,0] of
    a 1-DoF z-joint = (R I R^T)_zz + m (cx^2 + cy^2)."""
    urdf = """
<robot name="one">
  <link name="base"/>
  <link name="s1"><inertial>
    <origin xyz="0.02 -0.01 0.11" rpy="0.1 0 0.2"/><mass value="3.1"/>
    <inertia ixx="0.031" iyy="0.027" izz="0.012" ixy="0.002" ixz="-0.001" iyz="0.003"/>
  </inertial></link>
  <joint name="q1" type="revolute"><parent link="base"/><child link="s1"/>
    <origin xyz="0 0 0.15"/><axis xyz="0 0 1"/>
    <limit lower="-3" upper="3" effort="150" velocity="4"/></joint>
</robot>"""
    model = load_urdf(urdf)
    B = np.asarray(dynamics.mass_matrix(
        model, RobotState.init(model, dtype=DT)))

    def _R(r, p, y):
        def Rx(a):
            c, s = np.cos(a), np.sin(a)
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

        def Rz(a):
            c, s = np.cos(a), np.sin(a)
            return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

        return Rz(y) @ Rx(r)

    I = np.array([[.031, .002, -.001], [.002, .027, .003],
                  [-.001, .003, .012]])
    R = _R(0.1, 0.0, 0.2)
    M00 = (R @ I @ R.T)[2, 2] + 3.1 * (0.02 ** 2 + 0.01 ** 2)
    np.testing.assert_allclose(B[0, 0], M00, rtol=1e-6)


# --------------------------------------------------------------------------
# floating base: cross-check under the exact basis mapping
# --------------------------------------------------------------------------
URDF_FLOAT = """
<robot name="hopper">
  <link name="trunk"><inertial>
    <origin xyz="0.01 0.02 -0.03"/><mass value="8.0"/>
    <inertia ixx="0.09" iyy="0.11" izz="0.07" ixy="0.004" ixz="-0.002" iyz="0.001"/>
  </inertial></link>
  <link name="thigh"><inertial>
    <origin xyz="0 0 -0.12"/><mass value="1.6"/>
    <inertia ixx="0.012" iyy="0.012" izz="0.002" ixy="0" ixz="0" iyz="0"/>
  </inertial></link>
  <link name="shank"><inertial>
    <origin xyz="0 0 -0.14"/><mass value="0.9"/>
    <inertia ixx="0.008" iyy="0.008" izz="0.001" ixy="0" ixz="0" iyz="0"/>
  </inertial></link>
  <link name="foot"><inertial>
    <origin xyz="0.02 0 -0.02"/><mass value="0.3"/>
    <inertia ixx="0.0008" iyy="0.0012" izz="0.0008" ixy="0" ixz="0" iyz="0"/>
  </inertial></link>
  <joint name="hip" type="revolute"><parent link="trunk"/><child link="thigh"/>
    <origin xyz="0 -0.05 -0.1" rpy="0.05 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-2" upper="2" effort="120" velocity="10"/></joint>
  <joint name="knee" type="revolute"><parent link="thigh"/><child link="shank"/>
    <origin xyz="0 0 -0.25"/><axis xyz="0 1 0"/>
    <limit lower="-2.4" upper="0" effort="90" velocity="12"/></joint>
  <joint name="ankle" type="revolute"><parent link="shank"/><child link="foot"/>
    <origin xyz="0 0 -0.27" rpy="0 0.1 0"/><axis xyz="1 0 0"/>
    <limit lower="-1" upper="1" effort="40" velocity="12"/></joint>
</robot>
"""


@pytest.fixture(scope="module")
def fpair(tmp_path_factory):
    model = load_urdf(URDF_FLOAT, floating=True)
    # MuJoCo needs an explicit freejoint wrapper for a floating URDF root:
    # wrap via MJCF include of the same bodies is messy, so build the MJCF
    # equivalent by loading the URDF fixed-base and re-rooting with a
    # <mujoco> extension tag understood by the importer.
    urdf = URDF_FLOAT.replace(
        "<robot name=\"hopper\">",
        "<robot name=\"hopper\">\n  <mujoco><compiler fusestatic=\"false\"/>"
        "</mujoco>")
    p = tmp_path_factory.mktemp("urdf") / "hopper.urdf"
    p.write_text(urdf)
    spec = mujoco.MjSpec.from_file(str(p))
    # give the root body a free joint (the URDF spec has no syntax for it)
    spec.body("trunk").add_freejoint()
    mj = spec.compile()
    return model, mj


def _float_state(model, seed):
    rng = np.random.default_rng(seed)
    q = rng.uniform(-0.8, 0.8, model.nj)
    qd = rng.uniform(-1.0, 1.0, model.nj)
    w = rng.uniform(-0.5, 0.5, 3)
    ang = np.linalg.norm(w)
    axis = w / ang
    quat = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
    base_pos = rng.uniform(-0.5, 0.5, 3)
    base_vel = rng.uniform(-1.0, 1.0, 6)  # [w_b; v_b] body frame
    return q, qd, quat, base_pos, base_vel


def _quat_to_R(quat):
    w, x, y, z = quat
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _mj_float_state(mj, model, q, qd, quat, base_pos, base_vel):
    """MuJoCo free joint: qpos = [pos(3), quat wxyz]; qvel = [v_world(3),
    w_body(3)]. Ours: base_vel = [w_body; v_body]."""
    d = mujoco.MjData(mj)
    R = _quat_to_R(quat)
    d.qpos[:3] = base_pos
    d.qpos[3:7] = quat
    d.qpos[7:] = q
    d.qvel[:3] = R @ base_vel[3:]       # world linear
    d.qvel[3:6] = base_vel[:3]          # body angular
    d.qvel[6:] = qd
    mujoco.mj_forward(mj, d)
    return d


def _basis_T(R, nj):
    """u' (mujoco qvel order) = T u (ours): u = [w_b; v_b; qd]."""
    n = 6 + nj
    T = np.zeros((n, n))
    T[0:3, 3:6] = R            # v_world = R v_b
    T[3:6, 0:3] = np.eye(3)    # w stays body
    T[6:, 6:] = np.eye(nj)
    return T


def test_floating_fk_matches_mujoco(fpair):
    model, mj = fpair
    q, qd, quat, base_pos, base_vel = _float_state(model, 0)
    d = _mj_float_state(mj, model, q, qd, quat, base_pos, base_vel)
    R = _quat_to_R(quat)
    st = RobotState.init(model, q=q, qd=qd, base_rot=R, base_pos=base_pos,
                         base_vel=base_vel, dtype=DT)
    kin = kinematics.fk(model, st)
    for li, name in enumerate(model.link_names):
        bid = mj.body(name).id
        np.testing.assert_allclose(np.asarray(kin.p[li]), d.xpos[bid],
                                   atol=1e-6, err_msg=name)


def test_floating_mass_matrix_matches_mujoco(fpair):
    """M_ours == T^T M_mj T (covariant transform of the metric)."""
    model, mj = fpair
    for seed in range(3):
        q, qd, quat, base_pos, base_vel = _float_state(model, seed)
        d = _mj_float_state(mj, model, q, qd, quat, base_pos, base_vel)
        R = _quat_to_R(quat)
        st = RobotState.init(model, q=q, qd=qd, base_rot=R,
                             base_pos=base_pos, base_vel=base_vel, dtype=DT)
        B = np.asarray(dynamics.mass_matrix(model, st))
        M_mj = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, M_mj)
        T = _basis_T(R, model.nj)
        np.testing.assert_allclose(B, T.T @ M_mj @ T, atol=1e-7)


def test_floating_nonlinear_term_matches_mujoco(fpair):
    """h_ours = T^T (h_mj + M_mj [R (w_b x v_b); 0]): the change of basis
    u' = T(q) u adds the Tdot u convective term to the bias."""
    model, mj = fpair
    for seed in range(3):
        q, qd, quat, base_pos, base_vel = _float_state(model, seed)
        d = _mj_float_state(mj, model, q, qd, quat, base_pos, base_vel)
        R = _quat_to_R(quat)
        st = RobotState.init(model, q=q, qd=qd, base_rot=R,
                             base_pos=base_pos, base_vel=base_vel, dtype=DT)
        h = np.asarray(dynamics.nonlinear_term(model, st))
        M_mj = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, M_mj)
        T = _basis_T(R, model.nj)
        tdot_u = np.zeros(mj.nv)
        tdot_u[:3] = R @ np.cross(base_vel[:3], base_vel[3:])
        h_mapped = T.T @ (d.qfrc_bias + M_mj @ tdot_u)
        np.testing.assert_allclose(h, h_mapped, atol=1e-6)
