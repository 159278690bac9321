"""Round-5 biped gait recipe driver — the exact configuration whose
telemetry diagnosed and fixed the 2nd-weight-shift failure (see
docs/ARCHITECTURE.md "Biped weight transfer" and the strict-xfail
tests/test_humanoid_walk.py for the surviving multi-stride frontier).

Usage: python tools/exp_humanoid_walk_recipe.py [n_strides]
Prints per-300-tick telemetry: CoM vs its reference, servo integrator,
foot positions, commanded normal forces, solver failures.
"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.contact_switch import LegLiftPhases
from qppvm_tpu.runtime.estimator import sync_model_state
from qppvm_tpu.runtime.gait import GaitScript
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

NST = int(sys.argv[1]) if len(sys.argv) > 1 else 2
CONTACTS = ("l_sole", "r_sole")
PATCH = [[0.10, 0.05, 0.0], [0.10, -0.05, 0.0],
         [-0.06, 0.05, 0.0], [-0.06, -0.05, 0.0]]

model = zoo.humanoid()
plugin = ForceAccPlugin(model, contact_links=CONTACTS, waist_link="pelvis",
                        iters=80, switchable_contacts=True,
                        use_friction_cones=True, mu=0.6, wrench_dim=6,
                        force_share_mode="static", waist_priority="soft",
                        cop_box=(-0.06, 0.10, 0.05, 0.02))
st = standing_state(model, CONTACTS)
robot = SimRobot(model, state=st, dt=1e-3, substeps=2,
                 contact_links=CONTACTS, ground_z=0.0,
                 contact_offsets={c: PATCH for c in CONTACTS})
refs, warm, initial_waist = plugin.on_start(robot.state)

phases = LegLiftPhases(settle=150, shift=900, dwell=200, unload=180,
                       lift=250, hold=150, lower=250, reload=200)
gait = GaitScript(model, plugin, refs, initial_waist,
                  order=("l_sole", "r_sole"), stride=(0.0, 0.0),
                  n_strides=NST, phases=phases, shift_mode="centroid",
                  lift_height=0.04, swing_kp=100.0, swing_w=3.0,
                  stance_kp=100.0, stance_w=2.0, touch_depth=0.015,
                  shift_a_max=0.3, com_servo=dict(kp=1.0, kd=0.7, ki=1.0),
                  unload_gate=dict(tol_p=0.02, tol_v=0.04, max_extra=800))
li, ri = model.link_index("l_sole"), model.link_index("r_sole")
print(f"total<= {gait.total} strides={NST}", flush=True)
nf = 0
for i in range(gait.total):
    state = sync_model_state(robot, model)
    refs_t = gait.refs_at(i, state)
    tau, warm, aux = plugin.control_loop(state, refs_t, warm)
    nf += int(bool(aux.solver_failed))
    robot.set_reference(tau_ref=tau, q_ref=state.q)
    robot.move()
    up = float(robot.state.base_rot[2, 2])
    if i % 300 == 0 or up < 0.8:
        kin = kinematics.fk(model, robot.state)
        com = np.asarray(kinematics.com(model, kin)[1])
        cr = np.asarray(gait._script.com_ref_at(
            min(i - gait._t0 - gait._extra,
                gait._script.total - 1))[0])
        w = np.asarray(aux.wrenches)
        print(f"t{i:5d} k{gait._k} ex{gait._extra} up={up:.3f} "
              f"cy={com[1]:+.4f} cref_y={cr[1]:+.4f} "
              f"ly={float(kin.p[li][1]):+.4f} "
              f"ry={float(kin.p[ri][1]):+.4f} "
              f"fzL={w[0, 2]:6.1f} fzR={w[1, 2]:6.1f} fails={nf}",
              flush=True)
    if up < 0.8:
        print(f"FELL at {i}")
        break
print(f"DONE up={float(robot.state.base_rot[2, 2]):.3f} fails={nf}",
      flush=True)
