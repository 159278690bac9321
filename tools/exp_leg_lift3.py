"""Leg lift v3: ff min-jerk + dwell + swing gain/weight schedule + cones."""
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state
from qppvm_tpu.runtime.trajectory import min_jerk_pva

CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")

model = zoo.quadruped()
plugin = ForceAccPlugin(model, contact_links=CONTACTS, waist_link="pelvis",
                        iters=80, switchable_contacts=True,
                        use_friction_cones=True, mu=0.5,
                        foot_tasks_6d=False)
st = standing_state(model, CONTACTS)
robot = SimRobot(model, state=st, dt=1e-3, substeps=4,
                 contact_links=CONTACTS, ground_z=0.0)
refs, warm, initial_waist = plugin.on_start(robot.state)
fl_idx = model.link_index("foot_fl")
p_fl0 = np.asarray(refs["foot_fl_cartesian"]["p"])
kin0 = kinematics.fk(model, robot.state)
support = np.stack([np.asarray(kin0.p[model.link_index(c)])
                    for c in ("foot_fr", "foot_hr", "foot_hl")])
com0 = np.asarray(kinematics.com(model, kin0)[1])[:2]

# shift the waist so the CoM lands 5 cm inside the tripod (normal to the
# fr-hl edge, which separates the fl corner from the support triangle)
waist0 = np.asarray(initial_waist)
fr, hr, hl = support[0, :2], support[1, :2], support[2, :2]
d = hl - fr
n = np.array([d[1], -d[0]]); n /= np.linalg.norm(n)
if np.dot(hr - fr, n) < 0:
    n = -n
dist = np.dot(com0 - fr, n)
shift = np.zeros(3)
shift[:2] = (0.08 - dist) * n

DT = 1e-3
T_SETTLE, T_SHIFT, T_DWELL = 150, 400, 150
T_UNLOAD, T_LIFT, T_HOLD, T_LOWER, T_REGATE = 150, 250, 250, 250, 250
t_unload0 = T_SETTLE + T_SHIFT + T_DWELL
t_lift0 = t_unload0 + T_UNLOAD
t_hold0 = t_lift0 + T_LIFT
t_lower0 = t_hold0 + T_HOLD
t_regate0 = t_lower0 + T_LOWER
TOTAL = t_regate0 + T_REGATE
LIFT_H = 0.05
FL_OFF = jnp.asarray((0.0, 1.0, 1.0, 1.0), jnp.float32)
ALL_ON = jnp.asarray((1.0, 1.0, 1.0, 1.0), jnp.float32)
SWING_KP, SWING_KD = 150.0, 2.0 * np.sqrt(150.0)

w0 = jnp.asarray(waist0, jnp.float32)
w1 = jnp.asarray(waist0 + shift, jnp.float32)
pf0 = jnp.asarray(p_fl0, jnp.float32)
pf1 = jnp.asarray(p_fl0 + [0, 0, LIFT_H], jnp.float32)
pf_dn = jnp.asarray(p_fl0 + [0, 0, -0.005], jnp.float32)


def set_cart(r, key, p, v, a, w=None, kp=None, kd=None):
    tr = dict(r[key])
    tr["p"] = p
    tr["v"] = jnp.zeros(6, jnp.float32).at[:3].set(v)
    tr["a"] = jnp.zeros(6, jnp.float32).at[:3].set(a)
    if w is not None:
        tr["w"] = jnp.asarray(w, jnp.float32)
    if kp is not None:
        tr["kp"] = jnp.asarray(kp, jnp.float32)
    if kd is not None:
        tr["kd"] = jnp.asarray(kd, jnp.float32)
    r[key] = tr
    return r


def swing_postural(r, on):
    po = dict(r["POSTURAL"])
    wv = np.ones(model.nj, np.float32)
    if on:
        wv[0:4] = 0.05
    po["w"] = jnp.asarray(wv)
    r["POSTURAL"] = po
    return r


T_RAMP = 100  # gate ramp: continuous unload/load of the switching foot


def fl_gate(g):
    return jnp.asarray((g, 1.0, 1.0, 1.0), jnp.float32)


def refs_at(i):
    r = dict(refs)
    # waist trajectory: min-jerk shift with v+a feedforward, then hold
    t_shift = np.clip((i - T_SETTLE) * DT, 0.0, T_SHIFT * DT)
    wp, wv, wa = min_jerk_pva(w0, w1, t_shift, T_SHIFT * DT)
    r = set_cart(r, "waist_task", wp, wv, wa)
    gate = ALL_ON
    if t_unload0 <= i < t_lift0:
        # ramp the gate 1 -> 0: cone bounds shrink continuously, squeezing
        # the foot's wrench to zero before the lift starts
        g = float(np.clip(1.0 - (i - t_unload0) / T_RAMP, 0.0, 1.0))
        gate = fl_gate(g)
    elif i >= t_lift0:
        if i < t_hold0:
            gate = FL_OFF
            t = (i - t_lift0) * DT
            p, v, a = min_jerk_pva(pf0, pf1, t, T_LIFT * DT)
            r = set_cart(r, "foot_fl_cartesian", p, v, a, w=4.0,
                         kp=SWING_KP, kd=SWING_KD)
            r = swing_postural(r, True)
        elif i < t_lower0:
            gate = FL_OFF
            r = set_cart(r, "foot_fl_cartesian", pf1, jnp.zeros(3),
                         jnp.zeros(3), w=4.0, kp=SWING_KP, kd=SWING_KD)
            r = swing_postural(r, True)
        elif i < t_regate0:
            gate = FL_OFF
            t = (i - t_lower0) * DT
            p, v, a = min_jerk_pva(pf1, pf_dn, t, T_LOWER * DT)
            r = set_cart(r, "foot_fl_cartesian", p, v, a, w=4.0,
                         kp=SWING_KP, kd=SWING_KD)
            r = swing_postural(r, True)
        else:
            g = float(np.clip((i - t_regate0) / T_RAMP, 0.0, 1.0))
            gate = fl_gate(g)
            r = set_cart(r, "foot_fl_cartesian", pf_dn, jnp.zeros(3),
                         jnp.zeros(3), w=4.0, kp=SWING_KP, kd=SWING_KD)
            r = swing_postural(r, True)
    r["contacts"] = {"active": gate}
    return r


feet0 = None
n_fail = 0
for i in range(TOTAL):
    state = robot.state
    r = refs_at(i)
    tau, warm, aux = plugin.control_loop(state, r, warm)
    if bool(aux.solver_failed):
        n_fail += 1
        if n_fail < 10:
            print(f"  SOLVER FAILED tick {i} prim_res={float(aux.prim_res):.2e}")
    robot.set_reference(tau_ref=tau, q_ref=state.q)
    robot.move()
    if i % 50 == 0 or i == TOTAL - 1:
        kin = kinematics.fk(model, robot.state)
        com_xy = np.asarray(kinematics.com(model, kin)[1])[:2]
        base = np.asarray(robot.state.base_pos)
        feet = np.stack([np.asarray(kin.p[model.link_index(c)])
                         for c in CONTACTS])
        if feet0 is None:
            feet0 = feet.copy()
        slip = np.linalg.norm((feet - feet0)[1:, :2], axis=1)
        w = np.asarray(aux.wrenches)
        print(f"t{i:4d} base={base.round(3)} com={com_xy.round(3)} "
              f"fl_z={float(kin.p[fl_idx][2]):+.4f} "
              f"fz={w[:, 2].round(0)} slip={slip.round(3)}")
print(f"total solver failures: {n_fail}")
