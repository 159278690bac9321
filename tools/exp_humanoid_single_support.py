"""Humanoid single-support: lift one sole via LegLiftScript (config 4)."""
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.contact_switch import LegLiftPhases, LegLiftScript
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

CONTACTS = ("l_sole", "r_sole")
PATCH = [[0.10, 0.05, 0.0], [0.10, -0.05, 0.0],
         [-0.06, 0.05, 0.0], [-0.06, -0.05, 0.0]]

model = zoo.humanoid()
plugin = ForceAccPlugin(model, contact_links=CONTACTS, waist_link="pelvis",
                        iters=80, switchable_contacts=True,
                        use_friction_cones=True, mu=0.6, wrench_dim=6)
st = standing_state(model, CONTACTS)
robot = SimRobot(model, state=st, dt=1e-3, substeps=4,
                 contact_links=CONTACTS, ground_z=0.0,
                 contact_offsets={c: PATCH for c in CONTACTS})
refs, warm, initial_waist = plugin.on_start(robot.state)
l_idx = model.link_index("l_sole")
phases = LegLiftPhases(settle=200, shift=500, dwell=200, unload=200,
                       lift=300, hold=300, lower=300, reload=250)
script = LegLiftScript(model, plugin, refs, initial_waist, "l_sole",
                       state=robot.state, phases=phases,
                       lift_height=0.04, swing_kp=100.0, swing_w=3.0)

n_fail = 0
lift_z = []
for i in range(script.total):
    state = robot.state
    tau, warm, aux = plugin.control_loop(state, script.refs_at(i), warm)
    if bool(aux.solver_failed):
        n_fail += 1
        if n_fail < 8:
            print(f"  FAIL tick {i} prim={float(aux.prim_res):.2e}")
    robot.set_reference(tau_ref=tau, q_ref=state.q)
    robot.move()
    if script.t_hold0 <= i < script.t_lower0:
        kin = kinematics.fk(model, robot.state)
        lift_z.append(float(kin.p[l_idx][2]))
    if i % 100 == 0:
        kin = kinematics.fk(model, robot.state)
        w = np.asarray(aux.wrenches)
        up = float(robot.state.base_rot[2, 2])
        print(f"t{i:4d} z={float(robot.state.base_pos[2]):.3f} up={up:.3f} "
              f"l_z={float(kin.p[l_idx][2]):+.4f} fz={w[:, 2].round(0)}")
print(f"failures={n_fail} hold mean l_z={np.mean(lift_z):+.4f} "
      f"max={np.max(lift_z):+.4f}")
up = float(robot.state.base_rot[2, 2])
print(f"final up={up:.3f} z={float(robot.state.base_pos[2]):.3f}")
