"""Diagnose the base drift during single support: pelvis tracking vs com."""
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
                        iters=80, switchable_contacts=True,
                        use_friction_cones=True, mu=0.5)
st = standing_state(model, CONTACTS)
robot = SimRobot(model, state=st, dt=1e-3, substeps=4,
                 contact_links=CONTACTS, ground_z=0.0)
refs, warm, initial_waist = plugin.on_start(robot.state)
fl_idx = model.link_index("foot_fl")
pelvis_idx = model.link_index("pelvis")
p_fl0 = np.asarray(refs["foot_fl_cartesian"]["p"])
kin0 = kinematics.fk(model, robot.state)
support = np.stack([np.asarray(kin0.p[model.link_index(c)])
                    for c in ("foot_fr", "foot_hr", "foot_hl")])
com0 = np.asarray(kinematics.com(model, kin0)[1])[:2]

waist0 = np.asarray(initial_waist)
fr, hr, hl = support[0, :2], support[1, :2], support[2, :2]
d = hl - fr
n = np.array([d[1], -d[0]]); n /= np.linalg.norm(n)
if np.dot(hr - fr, n) < 0:
    n = -n
dist = np.dot(com0 - fr, n)
shift = np.zeros(3)
shift[:2] = (0.045 - dist) * n

FL_OFF = jnp.asarray((0.0, 1.0, 1.0, 1.0), jnp.float32)
DT = 1e-3
T_SETTLE, T_SHIFT, T_LIFT = 150, 600, 300


def phase_refs(i):
    r = dict(refs)
    t_shift = np.clip((i - T_SETTLE) * DT, 0.0, T_SHIFT * DT)
    wp, wv = min_jerk(jnp.asarray(waist0, jnp.float32),
                      jnp.asarray(waist0 + shift, jnp.float32),
                      t_shift, T_SHIFT * DT)
    wt = dict(r["waist_task"])
    wt["p"] = wp
    wt["v"] = jnp.zeros(6, jnp.float32).at[:3].set(wv)
    r["waist_task"] = wt
    t0_lift = T_SETTLE + T_SHIFT
    if i >= t0_lift:
        r["contacts"] = {"active": FL_OFF}
        t = (i - t0_lift) * DT
        p, v = min_jerk(jnp.asarray(p_fl0, jnp.float32),
                        jnp.asarray(p_fl0 + [0, 0, 0.06], jnp.float32),
                        t, T_LIFT * DT)
        tr = dict(r["foot_fl_cartesian"])
        tr["p"] = p
        tr["v"] = jnp.zeros(6, jnp.float32).at[:3].set(v)
        tr["w"] = jnp.asarray(6.0, jnp.float32)
        r["foot_fl_cartesian"] = tr
        po = dict(r["POSTURAL"])
        wv_ = np.ones(model.nj, np.float32)
        wv_[0:3] = 0.02
        po["w"] = jnp.asarray(wv_)
        r["POSTURAL"] = po
    return r, np.asarray(wp)


for i in range(1300):
    state = robot.state
    r, wp = phase_refs(i)
    tau, warm, aux = plugin.control_loop(state, r, warm)
    if bool(aux.solver_failed):
        print(f"  SOLVER FAILED tick {i} prim_res={float(aux.prim_res):.2e}")
    robot.set_reference(tau_ref=tau, q_ref=state.q)
    robot.move()
    if i % 50 == 0:
        kin = kinematics.fk(model, robot.state)
        com_xy = np.asarray(kinematics.com(model, kin)[1])[:2]
        base = np.asarray(robot.state.base_pos)
        feet = np.stack([np.asarray(kin.p[model.link_index(c)])
                         for c in CONTACTS])
        if i == 0:
            feet0 = feet.copy()
        slip = np.linalg.norm((feet - feet0)[1:, :2], axis=1)  # stance only
        R = np.asarray(robot.state.base_rot)
        print(f"t{i:4d} base={base.round(3)} ref={wp.round(3)} "
              f"com={com_xy.round(3)} fl_z={float(kin.p[fl_idx][2]):+.4f} "
              f"tilt={R[2,2]:.4f} slip={slip.round(3)}")
