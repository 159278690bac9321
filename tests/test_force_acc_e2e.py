"""End-to-end ForceAcc floating-base WBC in contact simulation (config 3-ish:
contact force distribution with unilateral constraints).

Mirrors /root/reference/src/ForceAcc.cpp semantics: stand on 4 feet, then
squat by 10 cm (waist ref = initial - 0.1 z, :181).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.model.robot import RobotState
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.robot_interface import SimRobot

CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")


def _standing_robot(model, dt=1e-3):
    """Place the base so feet touch the ground plane z=0."""
    st = model.home_state()
    kin = kinematics.fk(model, st)
    foot_z = min(float(kin.p[model.link_index(c)][2]) for c in CONTACTS)
    st = dataclasses.replace(
        st, base_pos=st.base_pos - jnp.asarray([0.0, 0.0, foot_z],
                                               st.base_pos.dtype))
    return SimRobot(model, state=st, dt=dt, substeps=4,
                    contact_links=CONTACTS, ground_z=0.0)


def _sync_state(robot):
    return robot.state  # sim gives full state incl. floating base (the
    # IMU + shared-memory fusion path of sync_model is tested separately)


def test_quadruped_stand_and_squat():
    model = zoo.quadruped()
    plugin = ForceAccPlugin(model, iters=80)
    robot = _standing_robot(model)
    state = _sync_state(robot)
    refs, warm, initial_waist = plugin.on_start(state)
    z0 = float(robot.state.base_pos[2])

    m_total = None
    fz_sum = []
    feas = []
    for i in range(800):
        state = _sync_state(robot)
        if i > 300:
            refs_t = plugin.squat_refs(refs, initial_waist, depth=0.05)
        else:
            refs_t = refs
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        assert not bool(aux.solver_failed), f"solver failed at tick {i}"
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        if 100 < i <= 300:
            fz_sum.append(float(np.sum(np.asarray(aux.wrenches)[:, 2])))
            feas.append(np.max(np.abs(np.asarray(aux.dyn_feas_residual))))

    # robot did not fall
    z1 = float(robot.state.base_pos[2])
    assert z1 > z0 - 0.12, (z0, z1)
    # squat tracked: waist moved down by roughly the commanded depth
    assert z1 < z0 - 0.01, (z0, z1)

    # during quiet standing: total normal force ~ weight
    from qppvm_tpu.model.kinematics import com, fk
    total_mass = float(com(model, fk(model, robot.state))[0])
    weight = total_mass * 9.81
    assert abs(np.mean(fz_sum) - weight) < 0.25 * weight, (
        np.mean(fz_sum), weight)
    # dynamic feasibility equality satisfied at the solution
    assert np.max(feas) < 1.0, np.max(feas)
    # unilateral constraint: every commanded normal force >= 10 N
    assert np.min(np.asarray(aux.wrenches)[:, 2]) >= 10.0 - 1e-3


def test_friction_cone_variant():
    """North-star variant: friction cones instead of plain boxes."""
    model = zoo.quadruped()
    plugin = ForceAccPlugin(model, iters=80, use_friction_cones=True, mu=0.6)
    robot = _standing_robot(model)
    refs, warm, _ = plugin.on_start(robot.state)
    for i in range(100):
        tau, warm, aux = plugin.control_loop(robot.state, refs, warm)
        assert not bool(aux.solver_failed)
        robot.set_reference(tau_ref=tau, q_ref=robot.state.q)
        robot.move()
    w = np.asarray(aux.wrenches)
    mu_eff = 0.6 / np.sqrt(2.0)
    assert np.all(np.abs(w[:, 0]) <= mu_eff * w[:, 2] + 1e-3)
    assert np.all(np.abs(w[:, 1]) <= mu_eff * w[:, 2] + 1e-3)
    assert np.all(w[:, 2] >= 10.0 - 1e-3)


def test_drive_pd_softening_profile():
    """The reference softens the drive PD (k/16, d/4) before handing the
    robot to the QP (/root/reference/src/ForceAcc.cpp:33-39)."""
    model = zoo.quadruped()
    plugin = ForceAccPlugin(model, iters=10)
    robot = _standing_robot(model)
    k0 = jnp.full((model.nj,), 800.0)
    d0 = jnp.full((model.nj,), 20.0)
    k, d = plugin.drive_pd_profile(k0, d0)
    np.testing.assert_allclose(np.asarray(k), 50.0)
    np.testing.assert_allclose(np.asarray(d), 5.0)
    robot.set_stiffness(k)
    robot.set_damping(d)
    np.testing.assert_allclose(np.asarray(robot.k), 50.0)


def test_subtask_splits_built_but_unstacked():
    """The reference constructs pos/or SubTask splits of feet and waist but
    never stacks them (/root/reference/src/ForceAcc.cpp:125-129) — mirror
    that: splits exist, slice the right rows, and are not in the stack."""
    import jax.numpy as jnp
    from qppvm_tpu.model import dynamics, zoo
    from qppvm_tpu.plugins.force_acc import ForceAccPlugin
    from qppvm_tpu.tasks.base import AssembleCtx

    model = zoo.quadruped()
    plugin = ForceAccPlugin(model, iters=20)
    assert len(plugin.feet_pos) == 4
    state = model.home_state()
    data = dynamics.compute_model_data(model, state)
    refs = plugin.stack.ref_init(model, data, state)
    ctx = AssembleCtx(model=model, data=data, state=state, refs=refs,
                      nx=plugin.opt.size, dtype=jnp.float32)
    A_full, b_full = plugin.waist_task.assemble(ctx)
    A_pos, b_pos = plugin.waist_pos.assemble(ctx)
    A_or, _ = plugin.waist_or.assemble(ctx)
    assert A_pos.shape[0] == 3 and A_or.shape[0] == 3
    import numpy as np
    np.testing.assert_array_equal(np.asarray(A_pos), np.asarray(A_full[:3]))
    np.testing.assert_array_equal(np.asarray(A_or), np.asarray(A_full[3:6]))
    names = {t.name for lvl in plugin.stack.levels for t in lvl}
    assert plugin.waist_pos.name not in names
