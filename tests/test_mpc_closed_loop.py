"""Closed-loop sampling MPC (config 5 end-to-end): MPPI re-plans while the
WBC tick runs against the contact sim, plan -> act -> shift -> re-plan.
The round-1 pipeline only exercised single open-loop planning steps;
round 3 closes the ESTIMATION loop too — both the RT tick and the planner
consume the leg-odometry+IMU estimate, never simulator ground truth
(/root/reference/src/ForceAcc.cpp:256-282 sense->sync path)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import zoo
from qppvm_tpu.mpc.rollout import RolloutConfig, standing_state
from qppvm_tpu.mpc.sampling import MPPIConfig, SamplingMPC
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.estimator import FloatingBaseEstimator
from qppvm_tpu.runtime.robot_interface import SimRobot

CONTACTS = ("l_sole", "r_sole")


def test_humanoid_push_recovery_closed_loop():
    model = zoo.humanoid()
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=40)
    st0 = standing_state(model, CONTACTS)
    robot = SimRobot(model, state=st0, dt=1e-3, substeps=2,
                     contact_links=CONTACTS)
    refs, warm, initial_waist = plugin.on_start(robot.state)
    est = FloatingBaseEstimator(model, CONTACTS)
    est_state = est.init(robot.state)

    mppi = MPPIConfig(n_samples=16, horizon=4, noise_std=0.2, push_std=20.0)
    rcfg = RolloutConfig(horizon=4, qp_iters=15, dt=0.02)
    mpc = SamplingMPC(plugin, mppi, rcfg)
    U = mpc.init_plan()
    key = jax.random.PRNGKey(0)

    waist_p = initial_waist
    plan_every = 20          # re-plan at 50 Hz against the 1 kHz WBC tick
    fail_fracs = []
    z_min = float(robot.state.base_pos[2])
    for i in range(400):
        imu = robot.get_imu()
        state, est_state = est.update(
            est_state, robot.get_motor_position(),
            robot.get_motor_velocity(), imu.orientation,
            imu.angular_velocity)
        if i % plan_every == 0:
            key, k = jax.random.split(key)
            U, info = mpc.plan(k, state, refs, warm, U)
            fail_fracs.append(float(info["solver_fail_frac"]))
            U = SamplingMPC.shift_plan(U)
        # apply the plan's first waist-velocity command to the tracked ref
        waist_p = waist_p + U[0] * 1e-3
        refs_t = dict(refs)
        wt = dict(refs_t["waist_task"])
        wt["p"] = waist_p
        refs_t["waist_task"] = wt
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        assert not bool(aux.solver_failed), f"RT tick {i}"
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        # lateral shove mid-run (impulse on the base)
        if i == 150:
            bv = robot.state.base_vel.at[4].add(0.25)  # 0.25 m/s sideways
            robot.state = dataclasses.replace(robot.state, base_vel=bv)
        z_min = min(z_min, float(robot.state.base_pos[2]))

    # every planning batch healthy
    assert max(fail_fracs) == 0.0, fail_fracs
    # robot survived the shove: never sank, still upright at the end
    z0 = float(st0.base_pos[2])
    assert z_min > z0 - 0.08, (z0, z_min)
    up = float(robot.state.base_rot[2, 2])
    assert up > 0.95, up
    # lateral velocity damped back out after the push
    assert abs(float(robot.state.base_vel[4])) < 0.15
