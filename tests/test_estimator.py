"""Floating-base estimation: reference sync_model data flow + leg odometry.

sync_model_state must reproduce the simulator's true state bit-for-bit (it
reads the same channels the reference reads,
/root/reference/src/ForceAcc.cpp:256-275). The leg-odometry estimator gets
no position channel and must still track base pose/velocity through a
closed-loop squat to mm/cm-level accuracy.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from qppvm_tpu.model import zoo
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.estimator import (EstimatorState,
                                         FloatingBaseEstimator,
                                         sync_model_state)
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")


@pytest.fixture(scope="module")
def quad():
    return zoo.quadruped()


def test_sync_model_state_matches_sim(quad):
    model = quad
    robot = SimRobot(model, dt=1e-3, contact_links=CONTACTS)
    robot.set_reference(tau_ref=jnp.zeros(model.nj), q_ref=robot.state.q)
    for _ in range(5):
        robot.move()
    est = sync_model_state(robot, model)
    truth = robot.state
    np.testing.assert_allclose(np.asarray(est.q), np.asarray(truth.q))
    np.testing.assert_allclose(np.asarray(est.base_pos),
                               np.asarray(truth.base_pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(est.base_rot),
                               np.asarray(truth.base_rot), atol=1e-6)
    # [w; v] body twist reconstructed from IMU + world velocity channel
    np.testing.assert_allclose(np.asarray(est.base_vel),
                               np.asarray(truth.base_vel), atol=1e-5)


def test_sync_model_state_fixed_base():
    model = zoo.arm7()
    robot = SimRobot(model, dt=1e-3)
    st = sync_model_state(robot, model)
    assert st.q.shape == (model.nj,)
    np.testing.assert_allclose(np.asarray(st.base_rot), np.eye(3))


def test_leg_odometry_static_exact(quad):
    """Standing still with perfect measurements: zero drift."""
    model = quad
    st = standing_state(model, CONTACTS)
    est = FloatingBaseEstimator(model, CONTACTS)
    es = est.init(st)
    for _ in range(10):
        out, es = est.update(es, st.q, st.qd, st.base_rot, st.base_vel[:3])
    np.testing.assert_allclose(np.asarray(out.base_pos),
                               np.asarray(st.base_pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.base_vel), 0.0, atol=1e-5)


def test_leg_odometry_tracks_squat(quad):
    """Closed-loop squat with the WBC in the loop: leg odometry (IMU + joint
    encoders only) must track the true base trajectory."""
    model = quad
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=40)
    robot = SimRobot(model, state=standing_state(model, CONTACTS),
                     dt=1e-3, substeps=4, contact_links=CONTACTS)
    refs, warm, initial_waist = plugin.on_start(robot.state)
    est = FloatingBaseEstimator(model, CONTACTS)
    es = est.init(robot.state)

    pos_err = []
    vel_err = []
    for i in range(300):
        truth = robot.state
        imu = robot.get_imu()
        out, es = est.update(es, truth.q, truth.qd, imu.orientation,
                             imu.angular_velocity)
        pos_err.append(np.linalg.norm(
            np.asarray(out.base_pos) - np.asarray(truth.base_pos)))
        vel_err.append(np.linalg.norm(
            np.asarray(out.base_vel[3:]) - np.asarray(truth.base_vel[3:])))
        refs_t = plugin.squat_refs(refs, initial_waist,
                                   depth=0.05 * min(1.0, i / 150.0))
        tau, warm, aux = plugin.control_loop(truth, refs_t, warm)
        robot.set_reference(tau_ref=tau, q_ref=truth.q)
        robot.move()
    # anchors penetrate/slip slightly in the compliant contact sim; cm-level
    assert max(pos_err) < 0.02, max(pos_err)
    assert np.mean(vel_err) < 0.05, np.mean(vel_err)


def test_contact_switch_reanchors(quad):
    model = quad
    st = standing_state(model, CONTACTS)
    est = FloatingBaseEstimator(model, CONTACTS)
    active = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    es = est.init(st, active)
    # lift foot 0, shift its anchor artificially, then re-make contact:
    # the anchor must snap back to the kinematically consistent position
    lifted = jnp.asarray([0.0, 1.0, 1.0, 1.0])
    out, es = est.update(es, st.q, st.qd, st.base_rot, st.base_vel[:3],
                         lifted)
    es = dataclasses.replace(
        es, anchors=es.anchors.at[0].add(
            jnp.asarray([1.0, 0.0, 0.0], dtype=es.anchors.dtype)))
    out, es = est.update(es, st.q, st.qd, st.base_rot, st.base_vel[:3],
                         active)
    # after re-make, anchor 0 is consistent again -> position estimate stays
    out2, es = est.update(es, st.q, st.qd, st.base_rot, st.base_vel[:3],
                          active)
    np.testing.assert_allclose(np.asarray(out2.base_pos),
                               np.asarray(st.base_pos), atol=1e-4)
