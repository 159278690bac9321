"""Receding-horizon centroidal DDP + WBC tracking, closed loop.

The planner computes a CoM trajectory toward a squat reference; the
whole-body controller tracks the planned CoM at sim rate. The composed loop
must move the base toward the target without solver failures — the
DDP-style analog of the sampling-MPC e2e test.
"""
import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import zoo
from qppvm_tpu.mpc.ddp_mpc import CentroidalMPC, CentroidalMPCConfig
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")


def test_ddp_wbc_closed_loop_squat():
    model = zoo.quadruped()
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=40)
    robot = SimRobot(model, state=standing_state(model, CONTACTS),
                     dt=1e-3, substeps=4, contact_links=CONTACTS)
    refs, warm, initial_waist = plugin.on_start(robot.state)

    mpc = CentroidalMPC(model, CONTACTS,
                        CentroidalMPCConfig(horizon=15, dt=0.02,
                                            iterations=4))
    U = mpc.init_plan(robot.state)

    # CoM target: 4 cm below the current CoM
    from qppvm_tpu.model import dynamics, kinematics
    kin0 = kinematics.fk(model, robot.state)
    _, com0 = kinematics.com(model, kin0)
    p_ref = jnp.asarray(com0) - jnp.asarray([0.0, 0.0, 0.04])

    plan_every = 20  # 50 Hz planning, 1 kHz tracking
    res = None
    fails = 0
    for i in range(600):
        state = robot.state
        if i % plan_every == 0:
            res, params = mpc.plan(state, p_ref, U)
            U = res.U
        waist_p = CentroidalMPC.waist_ref_from_plan(res, k=5)
        refs_t = dict(refs)
        wt = dict(refs_t["waist_task"])
        # track the planned CoM translation as a waist offset
        wt["p"] = initial_waist + (waist_p - jnp.asarray(com0))
        refs_t["waist_task"] = wt
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        fails += int(bool(aux.solver_failed))
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()

    kin1 = kinematics.fk(model, robot.state)
    _, com1 = kinematics.com(model, kin1)
    dz = float(com1[2] - com0[2])
    assert fails == 0
    assert np.all(np.isfinite(np.asarray(robot.state.q)))
    # the PLAN reaches the target (planner correctness) ...
    plan_end_z = float(res.X[-1][2])
    assert abs(plan_end_z - float(p_ref[2])) < 0.005, plan_end_z
    # ... and the tracked robot descends measurably (the WBC's impedance
    # tracking carries a few-mm steady-state lag — same behavior as the
    # squat demo; planner+tracker integration is what's under test here)
    assert dz < -0.008, dz
