"""Closed-loop contact switching: weight shift -> leg lift -> re-plant.

The static-walk primitive on top of the gated wrench constraints
(tasks/generic.py gate): deactivating a contact turns its wrench bound into
the equality f = 0 inside the same compiled program (static shapes —
BASELINE config 4 contact switching; capability upgrade over
/root/reference/src/ForceAcc.cpp:74-96 whose contact set is fixed).
Single-tick gate semantics are covered in test_humanoid_config4; this test
closes the loop: the simulated quadruped physically shifts its weight,
unloads, lifts (5 cm commanded), holds, re-plants a foot, and recovers
four-foot support — without falling, without stance-foot sliding, and
without a single solver failure.
"""
import numpy as np

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.contact_switch import LegLiftScript
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")


def test_leg_lift_and_replant():
    model = zoo.quadruped()
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=80,
                            switchable_contacts=True,
                            use_friction_cones=True, mu=0.5,
                            foot_tasks_6d=False)
    st = standing_state(model, CONTACTS)
    robot = SimRobot(model, state=st, dt=1e-3, substeps=4,
                     contact_links=CONTACTS, ground_z=0.0)
    refs, warm, initial_waist = plugin.on_start(robot.state)
    z0 = float(robot.state.base_pos[2])
    fl_idx = model.link_index("foot_fl")
    script = LegLiftScript(model, plugin, refs, initial_waist, "foot_fl",
                           state=robot.state, lift_height=0.05)

    kin0 = kinematics.fk(model, robot.state)
    stance_p0 = np.stack([np.asarray(kin0.p[model.link_index(c)])
                          for c in script.support])

    lift_fz = []    # QP wrench on the lifted foot during the hold
    lift_z = []     # physical foot height during the hold
    stance_fz = []  # stance normal forces during the hold

    for i in range(script.total):
        state = robot.state
        tau, warm, aux = plugin.control_loop(state, script.refs_at(i), warm)
        assert not bool(aux.solver_failed), \
            f"solver failed at tick {i} (prim_res={float(aux.prim_res):.2e})"
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        if script.t_hold0 <= i < script.t_lower0:
            w = np.asarray(aux.wrenches)
            lift_fz.append(float(w[script.foot_i, 2]))
            stance_fz.append(np.delete(w[:, 2], script.foot_i))
            kin = kinematics.fk(model, robot.state)
            lift_z.append(float(kin.p[fl_idx][2]))

    # while gated off, the QP commands zero wrench on the swing foot
    assert np.max(np.abs(lift_fz)) < 1e-2, np.max(np.abs(lift_fz))
    # ... and the foot is PHYSICALLY in the air (sim contact broken)
    assert np.mean(lift_z) > 0.02, np.mean(lift_z)
    # the three stance feet carry the whole weight
    total_mass = float(kinematics.com(
        model, kinematics.fk(model, robot.state))[0])
    weight = total_mass * 9.81
    tripod = float(np.mean(np.sum(np.stack(stance_fz), axis=1)))
    assert abs(tripod - weight) < 0.3 * weight, (tripod, weight)
    # stance feet never slid (stiction ground + cone-feasible commands)
    kin1 = kinematics.fk(model, robot.state)
    stance_p1 = np.stack([np.asarray(kin1.p[model.link_index(c)])
                          for c in script.support])
    slip = np.linalg.norm((stance_p1 - stance_p0)[:, :2], axis=1)
    assert np.all(slip < 0.06), slip
    # never fell, and the replant recovered 4-foot support
    z1 = float(robot.state.base_pos[2])
    assert z1 > z0 - 0.12, (z0, z1)
    w_final = np.asarray(aux.wrenches)
    assert np.all(w_final[:, 2] >= 10.0 - 1e-3), w_final[:, 2]
