"""ModelInterface API-parity wrapper tests (SURVEY.md C16)."""
import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import dynamics, zoo
from qppvm_tpu.model.interface import ModelInterface
from qppvm_tpu.runtime.robot_interface import SimRobot


def test_zoo_load_and_queries():
    mi = ModelInterface.get_model("dual_arm")
    assert mi.get_joint_num() == 15
    assert mi.get_dof_index("j_arm1_5") == 5
    q_home = mi.get_robot_state("home")
    mi.set_joint_position(q_home)
    mi.set_joint_velocity(jnp.zeros(15))
    mi.update()
    R, p = mi.get_pose("arm1_7")
    assert R.shape == (3, 3) and p.shape == (3,)
    J = mi.get_jacobian("arm1_7")
    assert J.shape == (6, 15)
    B = mi.get_inertia_matrix()
    assert B.shape == (15, 15)
    h = mi.compute_nonlinear_term()
    assert h.shape == (15,)
    lo, hi = mi.get_joint_limits()
    assert np.all(np.asarray(lo) < np.asarray(hi))


def test_inverse_dynamics_roundtrip():
    mi = ModelInterface.get_model("arm7")
    mi.update()
    qddot = jnp.linspace(-1, 1, 7)
    mi.set_joint_acceleration(qddot)
    tau = mi.compute_inverse_dynamics()
    tau2 = dynamics.inverse_dynamics(mi.model, mi.state, qddot)
    np.testing.assert_allclose(np.asarray(tau), np.asarray(tau2), atol=1e-6)


def test_floating_base_state_roundtrip():
    mi = ModelInterface.get_model("quadruped")
    R = jnp.eye(3)
    p = jnp.asarray([0.1, 0.2, 0.5])
    twist = jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.0, 0.2])  # [v; w] world
    mi.set_floating_base_state(R, p, twist)
    R2, p2 = mi.get_floating_base_pose()
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p))
    # body twist stored angular-first: w=(0,0,0.2), v=(0.3,0,0)
    np.testing.assert_allclose(np.asarray(mi.state.base_vel),
                               [0, 0, 0.2, 0.3, 0, 0], atol=1e-7)


def test_sync_from_robot():
    model = zoo.arm7()
    robot = SimRobot(model)
    mi = ModelInterface(model)
    mi.sync_from(robot)
    np.testing.assert_allclose(np.asarray(mi.get_joint_position()),
                               np.asarray(robot.get_motor_position()))
