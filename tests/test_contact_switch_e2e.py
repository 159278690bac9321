"""Closed-loop contact switching: weight shift -> leg lift -> re-plant.

The static-walk primitive on top of the gated wrench constraints
(tasks/generic.py GenericConstraint.gate): deactivating a contact turns its
wrench bound into the equality f = 0 inside the same compiled program
(static shapes — BASELINE config 4 contact switching; capability upgrade
over /root/reference/src/ForceAcc.cpp:74-96 whose contact set is fixed).
Single-tick gate semantics are covered in test_humanoid_config4; this test
closes the loop: the simulated quadruped physically unloads, lifts, and
re-plants a foot without falling and without a single solver failure.
"""
import numpy as np
import jax.numpy as jnp

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")


def _gated_refs(refs, active):
    refs = dict(refs)
    refs["contacts"] = {"active": jnp.asarray(active, jnp.float32)}
    return refs


def _foot_refs(refs, foot, p_new):
    refs = dict(refs)
    key = foot + "_cartesian"
    task_ref = dict(refs[key])
    task_ref["p"] = jnp.asarray(p_new, jnp.float32)
    refs[key] = task_ref
    return refs


def test_leg_lift_and_replant():
    model = zoo.quadruped()
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=80,
                            switchable_contacts=True)
    st = standing_state(model, CONTACTS)
    robot = SimRobot(model, state=st, dt=1e-3, substeps=4,
                     contact_links=CONTACTS, ground_z=0.0)
    refs, warm, initial_waist = plugin.on_start(robot.state)
    z0 = float(robot.state.base_pos[2])
    fl_idx = model.link_index("foot_fl")
    p_fl0 = np.asarray(refs["foot_fl_cartesian"]["p"])

    # support polygon of the remaining three feet (fr, hr, hl): shift the
    # waist reference toward their centroid before unloading foot_fl
    kin0 = kinematics.fk(model, robot.state)
    support = np.stack([np.asarray(kin0.p[model.link_index(c)])
                        for c in ("foot_fr", "foot_hr", "foot_hl")])
    centroid = support.mean(axis=0)
    waist_shifted = np.asarray(initial_waist).copy()
    waist_shifted[:2] += 0.8 * (centroid[:2] - waist_shifted[:2])

    def shifted_waist(refs):
        refs = dict(refs)
        wt = dict(refs["waist_task"])
        wt["p"] = jnp.asarray(waist_shifted, jnp.float32)
        refs["waist_task"] = wt
        return refs

    all_on = (1.0, 1.0, 1.0, 1.0)
    fl_off = (0.0, 1.0, 1.0, 1.0)
    lift_fz = []    # QP wrench on the lifted foot
    lift_z = []     # physical foot height during the hold
    stance_fz = []  # stance normal forces during the hold

    for i in range(850):
        state = robot.state
        if i < 150:                      # settle
            refs_t = refs
        elif i < 350:                    # shift weight over (fr, hr, hl)
            refs_t = shifted_waist(refs)
        elif i < 600:                    # unload + lift foot_fl by 6 cm
            refs_t = shifted_waist(refs)
            refs_t = _gated_refs(refs_t, fl_off)
            refs_t = _foot_refs(refs_t, "foot_fl",
                                p_fl0 + np.array([0.0, 0.0, 0.06]))
        else:                            # re-plant and re-activate
            refs_t = shifted_waist(refs)
            refs_t = _foot_refs(refs_t, "foot_fl", p_fl0)
            if i < 650:                  # gate back on only once it's down
                refs_t = _gated_refs(refs_t, fl_off)
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        assert not bool(aux.solver_failed), f"solver failed at tick {i}"
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        if 480 <= i < 600:               # steady part of the single-leg hold
            w = np.asarray(aux.wrenches)
            lift_fz.append(float(w[0, 2]))
            stance_fz.append(w[1:, 2])
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
    # never fell, and the replant recovered 4-foot support
    z1 = float(robot.state.base_pos[2])
    assert z1 > z0 - 0.12, (z0, z1)
    w_final = np.asarray(aux.wrenches)
    assert np.all(w_final[:, 2] >= 10.0 - 1e-3), w_final[:, 2]
