"""Demo: floating-base quadruped whole-body control (ForceAcc semantics,
/root/reference/src/ForceAcc.cpp): stand on four feet, then squat 5 cm.

Usage: python examples/demo_force_acc.py [--cpu] [--friction-cones]
"""
import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--friction-cones", action="store_true")
    ap.add_argument("--ticks", type=int, default=600)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from qppvm_tpu.model import kinematics, zoo
    from qppvm_tpu.plugins.force_acc import ForceAccPlugin
    from qppvm_tpu.runtime.robot_interface import SimRobot

    CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")
    model = zoo.quadruped()
    plugin = ForceAccPlugin(model, iters=80,
                            use_friction_cones=args.friction_cones)

    st = model.home_state()
    kin = kinematics.fk(model, st)
    foot_z = min(float(kin.p[model.link_index(c)][2]) for c in CONTACTS)
    st = dataclasses.replace(
        st, base_pos=st.base_pos - jnp.asarray([0.0, 0.0, foot_z]))
    robot = SimRobot(model, state=st, dt=1e-3, substeps=4,
                     contact_links=CONTACTS, ground_z=0.0)

    refs, warm, initial_waist = plugin.on_start(robot.state)
    z0 = float(robot.state.base_pos[2])
    for i in range(args.ticks):
        state = robot.state
        refs_t = (plugin.squat_refs(refs, initial_waist, 0.05)
                  if i > args.ticks // 2 else refs)
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        if bool(aux.solver_failed):
            print(f"SOLVER ERROR at tick {i} (skipping actuation)")
            continue
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        if i % 100 == 0:
            w = np.asarray(aux.wrenches)
            print(f"tick {i:4d}: base z={float(robot.state.base_pos[2]):.3f} "
                  f"fz={np.round(w[:, 2], 1)} sum={w[:, 2].sum():.0f}N "
                  f"feas={np.max(np.abs(np.asarray(aux.dyn_feas_residual))):.2e}")
    z1 = float(robot.state.base_pos[2])
    print(f"done: base height {z0:.3f} -> {z1:.3f} m "
          f"(commanded squat 0.05 m)")


if __name__ == "__main__":
    main()
