"""Centaur (the reference's actual Centauro morphology) end-to-end.

The reference runs ForceAccExample on the full Centauro — quadruped base
with torso + arms in the postural set (/root/reference/src/ForceAcc.cpp:58,
105-107) — while QPPVMPlugin drives the same robot's upper body
(/root/reference/src/QPPVMPlugin.cpp:50-51,129-152). This exercises the
combined morphology: 4 contact feet AND arm1_7/arm2_7 end-effector frames
on one floating-base model.
"""

import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")


def test_centaur_model_topology():
    model = zoo.centaur()
    assert model.floating
    assert model.nv == 37 and model.nj == 31
    for link in CONTACTS + ("arm1_7", "arm2_7", "torso", "pelvis"):
        model.link_index(link)  # raises KeyError if missing


def test_centaur_stand_squat_e2e():
    """Full-morphology ForceAcc: stand on 4 feet with the arms held by the
    postural task, then squat (/root/reference/src/ForceAcc.cpp:181)."""
    model = zoo.centaur()
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=80)
    st = standing_state(model, CONTACTS)
    robot = SimRobot(model, state=st, dt=1e-3, substeps=4,
                     contact_links=CONTACTS, ground_z=0.0)
    refs, warm, initial_waist = plugin.on_start(robot.state)
    z0 = float(robot.state.base_pos[2])
    q_upper_home = np.asarray(robot.state.q[12:])  # torso+arms (legs are q[:12])

    fz_sum = []
    for i in range(500):
        state = robot.state
        refs_t = (plugin.squat_refs(refs, initial_waist, depth=0.05)
                  if i > 250 else refs)
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        assert not bool(aux.solver_failed), f"solver failed at tick {i}"
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        if 100 < i <= 250:
            fz_sum.append(float(np.sum(np.asarray(aux.wrenches)[:, 2])))

    # did not fall; squat tracked
    z1 = float(robot.state.base_pos[2])
    assert z1 > z0 - 0.12, (z0, z1)
    assert z1 < z0 - 0.01, (z0, z1)
    # quiet standing supports the FULL centaur weight (arms included)
    total_mass = float(kinematics.com(
        model, kinematics.fk(model, robot.state))[0])
    weight = total_mass * 9.81
    assert abs(np.mean(fz_sum) - weight) < 0.25 * weight, (
        np.mean(fz_sum), weight)
    # the postural task held the torso+arms near home (no arm flail)
    q_upper = np.asarray(robot.state.q[12:])
    assert np.max(np.abs(q_upper - q_upper_home)) < 0.35, (
        np.max(np.abs(q_upper - q_upper_home)))
