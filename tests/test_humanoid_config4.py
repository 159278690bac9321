"""BASELINE config 4: full humanoid (32 DoF) complete WBC stack — standing
double support, CoM behavior and 1 kHz contact switching."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.robot_interface import SimRobot

CONTACTS = ("l_sole", "r_sole")


def _standing(model):
    st = model.home_state()
    kin = kinematics.fk(model, st)
    foot_z = min(float(kin.p[model.link_index(c)][2]) for c in CONTACTS)
    return dataclasses.replace(
        st, base_pos=st.base_pos - jnp.asarray([0.0, 0.0, foot_z],
                                               st.base_pos.dtype))


@pytest.fixture(scope="module")
def humanoid():
    return zoo.humanoid()


FOOT_PATCH = [[0.10, 0.05, 0.0], [0.10, -0.05, 0.0],
              [-0.06, 0.05, 0.0], [-0.06, -0.05, 0.0]]


def test_humanoid_double_support_stand(humanoid):
    model = humanoid
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=60,
                            use_friction_cones=True, mu=0.7, wrench_dim=6)
    robot = SimRobot(model, state=_standing(model), dt=1e-3, substeps=4,
                     contact_links=CONTACTS, ground_z=0.0,
                     contact_offsets={c: FOOT_PATCH for c in CONTACTS})
    refs, warm, _ = plugin.on_start(robot.state)
    z0 = float(robot.state.base_pos[2])
    fz = []
    for i in range(500):
        tau, warm, aux = plugin.control_loop(robot.state, refs, warm)
        assert not bool(aux.solver_failed), f"tick {i}"
        robot.set_reference(tau_ref=tau, q_ref=robot.state.q)
        robot.move()
        if i > 200:
            fz.append(np.asarray(aux.wrenches)[:, 2])
    z1 = float(robot.state.base_pos[2])
    assert abs(z1 - z0) < 0.06, (z0, z1)
    # both feet loaded, total ~ weight
    fz = np.mean(fz, axis=0)
    m, _ = kinematics.com(model, kinematics.fk(model, robot.state))
    weight = float(m) * 9.81
    assert abs(fz.sum() - weight) < 0.3 * weight, (fz, weight)
    assert np.all(fz > 10.0)


def test_contact_switching_zeroes_swing_foot(humanoid):
    """Deactivating a contact gate must force its commanded wrench to zero
    within the same compiled program (config 4 contact switching)."""
    model = humanoid
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=60,
                            switchable_contacts=True)
    state = _standing(model)
    refs, warm, _ = plugin.on_start(state)

    # both active: both feet push
    tau, warm, aux = plugin.control_loop(state, refs, warm)
    assert not bool(aux.solver_failed)
    w_both = np.asarray(aux.wrenches)
    assert np.all(w_both[:, 2] > 5.0)

    # lift the left foot: its force must vanish, right takes the load
    refs2 = dict(refs)
    refs2["contacts"] = {"active": jnp.asarray([0.0, 1.0], jnp.float32)}
    tau, warm, aux = plugin.control_loop(state, refs2, warm)
    assert not bool(aux.solver_failed)
    w = np.asarray(aux.wrenches)
    np.testing.assert_allclose(w[0], 0.0, atol=1e-3)
    assert w[1, 2] > w_both[1, 2] + 10.0  # right foot takes over the weight
