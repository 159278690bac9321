"""Experiment: leg lift via smooth refs + runtime task weights (no CoM loop)."""
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state
from qppvm_tpu.runtime.trajectory import min_jerk

CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")

model = zoo.quadruped()
plugin = ForceAccPlugin(model, contact_links=CONTACTS, waist_link="pelvis",
                        iters=80, switchable_contacts=True)
st = standing_state(model, CONTACTS)
robot = SimRobot(model, state=st, dt=1e-3, substeps=4,
                 contact_links=CONTACTS, ground_z=0.0)
# reference behavior: drives stay on a SOFTENED PD under the QP torques
# (/root/reference/src/ForceAcc.cpp:33-39)
k_soft, d_soft = plugin.drive_pd_profile(np.full(model.nj, 300.0),
                                         np.full(model.nj, 20.0))
robot.set_stiffness(k_soft)
robot.set_damping(d_soft)
refs, warm, initial_waist = plugin.on_start(robot.state)
fl_idx = model.link_index("foot_fl")
p_fl0 = np.asarray(refs["foot_fl_cartesian"]["p"])
kin0 = kinematics.fk(model, robot.state)
support = np.stack([np.asarray(kin0.p[model.link_index(c)])
                    for c in ("foot_fr", "foot_hr", "foot_hl")])
centroid = support.mean(axis=0)[:2]
com0 = np.asarray(kinematics.com(model, kin0)[1])[:2]
print("com0", com0, "centroid", centroid, "feet", support[:, :2])

waist0 = np.asarray(initial_waist)
# margin-based shift: move the CoM just past the support-triangle edge
# (the fr->hl diagonal), not all the way to the centroid
fr, hr, hl = support[0, :2], support[1, :2], support[2, :2]
d = hl - fr
n = np.array([d[1], -d[0]])
n /= np.linalg.norm(n)
if np.dot(hr - fr, n) < 0:
    n = -n                        # inward normal
dist = np.dot(com0 - fr, n)       # signed: positive = inside
margin = 0.045
shift = np.zeros(3)
shift[:2] = (margin - dist) * n
print("shift", shift)

FL_OFF = jnp.asarray((0.0, 1.0, 1.0, 1.0), jnp.float32)
DT = 1e-3
# phases (ticks)
T_SETTLE, T_SHIFT, T_LIFT, T_HOLD, T_REPLANT, T_REGATE = \
    150, 600, 300, 250, 300, 150

lift_z, lift_fz, stance_fz = [], [], []

tick = 0
def phase_refs(i):
    r = dict(refs)
    # waist: min-jerk shift during SHIFT, hold after
    t_shift = np.clip((i - T_SETTLE) * DT, 0.0, T_SHIFT * DT)
    wp, wv = min_jerk(jnp.asarray(waist0, jnp.float32),
                      jnp.asarray(waist0 + shift, jnp.float32),
                      t_shift, T_SHIFT * DT)
    wt = dict(r["waist_task"])
    wt["p"] = wp
    v6 = jnp.zeros(6, jnp.float32).at[:3].set(wv)
    wt["v"] = v6
    r["waist_task"] = wt

    t0_lift = T_SETTLE + T_SHIFT
    t0_hold = t0_lift + T_LIFT
    t0_replant = t0_hold + T_HOLD
    t0_regate = t0_replant + T_REPLANT
    if i >= t0_lift and i < t0_regate:
        # gated off + swing trajectory
        r["contacts"] = {"active": FL_OFF}
        if i < t0_hold:
            t = (i - t0_lift) * DT
            p, v = min_jerk(jnp.asarray(p_fl0, jnp.float32),
                            jnp.asarray(p_fl0 + [0, 0, 0.06], jnp.float32),
                            t, T_LIFT * DT)
        elif i < t0_replant:
            p = jnp.asarray(p_fl0 + [0, 0, 0.06], jnp.float32)
            v = jnp.zeros(3, jnp.float32)
        else:
            t = (i - t0_replant) * DT
            p, v = min_jerk(jnp.asarray(p_fl0 + [0, 0, 0.06], jnp.float32),
                            jnp.asarray(p_fl0, jnp.float32),
                            t, T_REPLANT * DT)
        tr = dict(r["foot_fl_cartesian"])
        tr["p"] = p
        tr["v"] = jnp.zeros(6, jnp.float32).at[:3].set(v)
        tr["w"] = jnp.asarray(6.0, jnp.float32)
        r["foot_fl_cartesian"] = tr
        po = dict(r["POSTURAL"])
        wv_ = np.ones(model.nj, np.float32)
        wv_[0:3] = 0.02          # fl leg joints
        po["w"] = jnp.asarray(wv_)
        r["POSTURAL"] = po
    return r

N = T_SETTLE + T_SHIFT + T_LIFT + T_HOLD + T_REPLANT + T_REGATE + 200
t0_hold = T_SETTLE + T_SHIFT + T_LIFT
for i in range(N):
    state = robot.state
    r = phase_refs(i)
    tau, warm, aux = plugin.control_loop(state, r, warm)
    assert not bool(aux.solver_failed), f"solver failed at tick {i}"
    robot.set_reference(tau_ref=tau, q_ref=state.q)
    robot.move()
    if t0_hold + 50 <= i < t0_hold + T_HOLD:
        w = np.asarray(aux.wrenches)
        lift_fz.append(float(w[0, 2]))
        stance_fz.append(w[1:, 2])
        kin = kinematics.fk(model, robot.state)
        lift_z.append(float(kin.p[fl_idx][2]))
    if i % 100 == 0:
        kin = kinematics.fk(model, robot.state)
        com_xy = np.asarray(kinematics.com(model, kin)[1])[:2]
        w = np.asarray(aux.wrenches)
        print(f"tick {i:4d} com={com_xy.round(3)} "
              f"fl_z={float(kin.p[fl_idx][2]):+.4f} fz={w[:, 2].round(1)} "
              f"base_z={float(state.base_pos[2]):.3f}")

print("HOLD: mean lift_z", np.mean(lift_z), "max |fz_fl|",
      np.max(np.abs(lift_fz)))
total_mass = float(kinematics.com(model, kinematics.fk(model, robot.state))[0])
print("tripod mean", np.mean(np.sum(np.stack(stance_fz), axis=1)),
      "weight", total_mass * 9.81)
w_final = np.asarray(aux.wrenches)
print("final fz", w_final[:, 2], "base_z", float(robot.state.base_pos[2]))
