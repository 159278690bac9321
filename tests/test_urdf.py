"""URDF loader tests: parsing, fixed-joint lumping, frame kinematics."""
import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import dynamics, kinematics
from qppvm_tpu.model.robot import RobotState
from qppvm_tpu.model.urdf import load_urdf

URDF_2LINK = """
<robot name="twolink">
  <link name="base"/>
  <link name="l1">
    <inertial>
      <origin xyz="0 0 0.25"/>
      <mass value="2.0"/>
      <inertia ixx="0.05" iyy="0.05" izz="0.001" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="l2">
    <inertial>
      <origin xyz="0 0 0.2"/>
      <mass value="1.0"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.001" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="tool">
    <inertial>
      <origin xyz="0 0 0.05"/>
      <mass value="0.3"/>
      <inertia ixx="0.001" iyy="0.001" izz="0.001" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0.1"/><axis xyz="0 1 0"/>
    <limit lower="-2" upper="2" effort="100" velocity="5"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="0 0 0.5"/><axis xyz="0 1 0"/>
    <limit lower="-2.5" upper="2.5" effort="60" velocity="5"/>
  </joint>
  <joint name="jt" type="fixed">
    <parent link="l2"/><child link="tool"/>
    <origin xyz="0 0 0.4" rpy="0 0 1.0"/>
  </joint>
</robot>
"""


def test_parse_basic():
    m = load_urdf(URDF_2LINK)
    assert m.nj == 2
    assert m.joint_names == ("j1", "j2")
    assert m.link_names == ("l1", "l2")
    assert not m.floating
    assert m.is_frame("tool")
    np.testing.assert_allclose(float(m.q_min[1]), -2.5)
    np.testing.assert_allclose(float(m.tau_max[0]), 100.0)


def test_fixed_joint_lumping_mass():
    m = load_urdf(URDF_2LINK)
    # l2 should carry its own 1.0 kg + tool 0.3 kg
    m_l2 = float(m.inertia[1, 5, 5])
    np.testing.assert_allclose(m_l2, 1.3, rtol=1e-6)


def test_frame_pose_and_jacobian():
    m = load_urdf(URDF_2LINK)
    st = RobotState.init(m, q=jnp.asarray([0.3, -0.7]), dtype=jnp.float64)
    kin = kinematics.fk(m, st)
    R, p = kinematics.link_pose(m, kin, "tool")
    # tool = l2 origin + R_l2 @ [0,0,0.4]
    R2, p2 = kinematics.link_pose(m, kin, "l2")
    np.testing.assert_allclose(np.asarray(p), np.asarray(p2 + R2 @ jnp.asarray([0., 0, 0.4])), atol=1e-6)

    # frame jacobian vs finite difference
    data = dynamics.compute_model_data(m, st)
    _, p0, J, vel, bias = dynamics.frame_data(m, data, "tool")
    eps = 1e-6
    for j in range(2):
        import dataclasses
        st2 = dataclasses.replace(st, q=st.q.at[j].add(eps))
        kin2 = kinematics.fk(m, st2)
        _, pp = kinematics.link_pose(m, kin2, "tool")
        fd = (pp - p0) / eps
        np.testing.assert_allclose(np.asarray(J[:3, j]), np.asarray(fd),
                                   atol=1e-4)


def test_frame_velocity_consistency():
    m = load_urdf(URDF_2LINK)
    st = RobotState.init(m, q=jnp.asarray([0.3, -0.7]),
                         qd=jnp.asarray([0.5, -0.2]), dtype=jnp.float64)
    data = dynamics.compute_model_data(m, st)
    _, _, J, vel, bias = dynamics.frame_data(m, data, "tool")
    np.testing.assert_allclose(np.asarray(vel), np.asarray(J @ st.qd),
                               atol=1e-6)


def test_floating_urdf():
    urdf = URDF_2LINK.replace('<robot name="twolink">',
                              '<robot name="twolink">')
    m = load_urdf(urdf, floating=True)
    assert m.floating
    assert m.nv == 8


def test_gravity_direction_double_pendulum():
    """Analytic check: 2-link pendulum gravity torque at q=0 (both links up)
    is zero; at q1=pi/2 the torque is m g * lever."""
    m = load_urdf(URDF_2LINK)
    st = RobotState.init(m, q=jnp.zeros(2))
    h = dynamics.nonlinear_term(m, st)
    np.testing.assert_allclose(np.asarray(h), 0.0, atol=1e-5)
    st = RobotState.init(m, q=jnp.asarray([np.pi / 2, 0.0]))
    h = dynamics.nonlinear_term(m, st)
    # lever arms: l1 com at 0.25 from j1; l2(+tool lumped) com beyond joint2
    m_l2 = 1.3
    com2_z = (1.0 * 0.2 + 0.3 * 0.45) / 1.3
    expected = -(2.0 * 9.81 * 0.25 + m_l2 * 9.81 * (0.5 + com2_z))
    np.testing.assert_allclose(float(h[0]), expected, rtol=1e-5)
