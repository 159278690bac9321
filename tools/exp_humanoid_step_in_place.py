"""Humanoid stepping-in-place via GaitScript (chained single-support)."""
import jax
jax.config.update("jax_platforms", "cpu")

import argparse

import numpy as np
import jax.numpy as jnp

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.contact_switch import LegLiftPhases
from qppvm_tpu.runtime.estimator import sync_model_state
from qppvm_tpu.runtime.gait import GaitScript
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

CONTACTS = ("l_sole", "r_sole")
PATCH = [[0.10, 0.05, 0.0], [0.10, -0.05, 0.0],
         [-0.06, 0.05, 0.0], [-0.06, -0.05, 0.0]]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    model = zoo.humanoid()
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=80,
                            switchable_contacts=True,
                            use_friction_cones=True, mu=0.6, wrench_dim=6)
    st = standing_state(model, CONTACTS)
    robot = SimRobot(model, state=st, dt=1e-3, substeps=2,
                     contact_links=CONTACTS, ground_z=0.0,
                     contact_offsets={c: PATCH for c in CONTACTS})
    refs, warm, initial_waist = plugin.on_start(robot.state)

    phases = LegLiftPhases(settle=150, shift=900, dwell=200, unload=180,
                           lift=250, hold=150, lower=250, reload=200)
    gait = GaitScript(model, plugin, refs, initial_waist,
                      order=("l_sole", "r_sole"), stride=(0.0, 0.0),
                      n_strides=args.steps, phases=phases,
                      shift_mode="centroid",
                      lift_height=0.04, swing_kp=100.0, swing_w=3.0)
    print(f"total {gait.total} ({gait.stride_ticks}/stride)")
    n_fail = 0
    lift_z = {c: [] for c in CONTACTS}
    gates = jnp.ones(len(CONTACTS), jnp.float32)
    for i in range(gait.total):
        # reference sync_model data flow: joint state + IMU + the sim's
        # floating-base channels (/root/reference/src/ForceAcc.cpp:256-282)
        state = sync_model_state(robot, model)
        refs_t = gait.refs_at(i, state)
        gates = refs_t["contacts"]["active"]
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        if bool(aux.solver_failed):
            n_fail += 1
            print(f"  FAIL tick {i} prim={float(aux.prim_res):.2e}")
            if n_fail > 5:
                break
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        k = min(i // gait.stride_ticks, args.steps - 1)
        foot = gait.swing_foot(k)
        s = gait._script
        j = i - k * gait.stride_ticks
        if s is not None and s.t_hold0 <= j < s.t_lower0:
            kin = kinematics.fk(model, robot.state)
            lift_z[foot].append(float(kin.p[model.link_index(foot)][2]))
        up = float(robot.state.base_rot[2, 2])
        if up < 0.8:
            print(f"FELL at {i}")
            break
        if i % 400 == 0:
            print(f"t{i:5d} stride{k} up={up:.3f} "
                  f"z={float(robot.state.base_pos[2]):.3f} "
                  f"est_z={float(state.base_pos[2]):.3f} "
                  f"gates={np.asarray(gates).round(2)}")
    up = float(robot.state.base_rot[2, 2])
    mz = {c: (np.mean(v) if v else None) for c, v in lift_z.items()}
    print(f"DONE: up={up:.3f} fails={n_fail} mean_lift_z={mz}")


if __name__ == "__main__":
    main()
