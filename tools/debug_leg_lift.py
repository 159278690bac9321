"""Debug the closed-loop leg lift: condition-based phase state machine."""
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")

model = zoo.quadruped()
plugin = ForceAccPlugin(model, contact_links=CONTACTS, waist_link="pelvis",
                        iters=80, switchable_contacts=True)
st = standing_state(model, CONTACTS)
robot = SimRobot(model, state=st, dt=1e-3, substeps=4,
                 contact_links=CONTACTS, ground_z=0.0)
refs, warm, initial_waist = plugin.on_start(robot.state)
fl_idx = model.link_index("foot_fl")
p_fl0 = np.asarray(refs["foot_fl_cartesian"]["p"])

kin0 = kinematics.fk(model, robot.state)
support = np.stack([np.asarray(kin0.p[model.link_index(c)])
                    for c in ("foot_fr", "foot_hr", "foot_hl")])
centroid = support.mean(axis=0)[:2]
com0 = np.asarray(kinematics.com(model, kin0)[1])[:2]

FL_OFF = (0.0, 1.0, 1.0, 1.0)


def build_refs(com_target, waist_adj, swing=None):
    """swing: None | (p, vz, gated)"""
    r = dict(refs)
    wt = dict(r["waist_task"])
    p_waist = np.asarray(initial_waist).copy()
    p_waist[:2] += waist_adj
    wt["p"] = jnp.asarray(p_waist, jnp.float32)
    r["waist_task"] = wt
    if swing is not None:
        p_sw, vz, gated = swing
        if gated:
            r["contacts"] = {"active": jnp.asarray(FL_OFF, jnp.float32)}
        tr = dict(r["foot_fl_cartesian"])
        tr["p"] = jnp.asarray(p_sw, jnp.float32)
        v = np.zeros(6, np.float32)
        v[2] = vz
        tr["v"] = jnp.asarray(v)
        tr["w"] = jnp.asarray(6.0 if gated else 1.0, jnp.float32)
        r["foot_fl_cartesian"] = tr
        if gated:
            po = dict(r["POSTURAL"])
            wv = np.ones(model.nj, np.float32)
            wv[0:3] = 0.02
            po["w"] = jnp.asarray(wv)
            r["POSTURAL"] = po
    return r


phase = "SETTLE"
phase_tick = 0
hold = 0
waist_adj = np.zeros(2)
com_prev = None

for i in range(4000):
    state = robot.state
    kin = kinematics.fk(model, state)
    com_xy = np.asarray(kinematics.com(model, kin)[1])[:2]
    fl_z = float(kin.p[fl_idx][2])
    phase_tick += 1

    com_target = com0 if phase in ("SETTLE", "RETURN", "DONE") else centroid
    comv = np.zeros(2) if com_prev is None else (com_xy - com_prev) / 1e-3
    com_prev = com_xy
    if phase != "SETTLE":
        # damped integrator: the derivative term kills the overshoot that
        # tips the robot during single support
        waist_adj += 0.004 * (com_target - com_xy) - 0.0012 * comv
        waist_adj = np.clip(waist_adj, -0.35, 0.35)

    swing = None
    if phase == "LIFT":
        swing = (p_fl0 + np.array([0, 0, 0.03]), 0.05, True)
    elif phase == "HOLD":
        swing = (p_fl0 + np.array([0, 0, 0.03]), 0.0, True)
    elif phase == "REPLANT":
        swing = (p_fl0, -0.08, True)
    elif phase in ("REGATE", "RETURN", "DONE"):
        swing = (p_fl0, 0.0, False)

    refs_t = build_refs(com_target, waist_adj, swing)
    tau, warm, aux = plugin.control_loop(state, refs_t, warm)
    assert not bool(aux.solver_failed), (phase, i)
    robot.set_reference(tau_ref=tau, q_ref=state.q)
    robot.move()
    w = np.asarray(aux.wrenches)

    prev = phase
    if phase == "SETTLE" and phase_tick > 150:
        phase = "SHIFT"
    elif phase == "SHIFT" and np.linalg.norm(com_xy - centroid) < 0.01:
        phase = "LIFT"
    elif phase == "LIFT" and fl_z > 0.02:
        phase = "HOLD"
    elif phase == "HOLD":
        hold += 1
        if hold >= 100:
            phase = "REPLANT"
    elif phase == "REPLANT" and fl_z < 0.003:
        phase = "REGATE"
    elif phase == "REGATE" and phase_tick > 150:
        phase = "RETURN"
    elif phase == "RETURN" and np.linalg.norm(com_xy - com0) < 0.015:
        phase = "DONE"
    elif phase == "DONE" and phase_tick > 200:
        break
    if phase != prev:
        phase_tick = 0
        print(f"--- {prev} -> {phase} at tick {i} "
              f"(com={com_xy.round(3)} fl_z={fl_z:+.4f})")

    if i % 100 == 0:
        print(f"tick {i:4d} [{phase:7s}] com={com_xy.round(3)} "
              f"fl_z={fl_z:+.4f} fz={w[:, 2].round(1)} "
              f"base_z={float(state.base_pos[2]):.3f}")

print("END phase", phase, "tick", i,
      "base", np.asarray(robot.state.base_pos).round(3))
