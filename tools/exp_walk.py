"""Tune the quadruped static walk (GaitScript) before pinning it as a test."""
import jax
jax.config.update("jax_platforms", "cpu")

import argparse
import time

import numpy as np

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.estimator import FloatingBaseEstimator
from qppvm_tpu.runtime.gait import GaitScript
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--strides", type=int, default=8)
    ap.add_argument("--stride-x", type=float, default=0.06)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--shift-mode", default="centroid")
    ap.add_argument("--touch-depth", type=float, default=0.005)
    ap.add_argument("--lift-height", type=float, default=0.05)
    ap.add_argument("--lower", type=int, default=250)
    ap.add_argument("--reload", type=int, default=200)
    ap.add_argument("--lift", type=int, default=250)
    ap.add_argument("--shift", type=int, default=350)
    ap.add_argument("--margin", type=float, default=0.08)
    ap.add_argument("--no-est", action="store_true")
    args = ap.parse_args()

    model = zoo.quadruped()
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=args.iters,
                            switchable_contacts=True,
                            use_friction_cones=True, mu=0.5,
                            foot_tasks_6d=False)
    st = standing_state(model, CONTACTS)
    robot = SimRobot(model, state=st, dt=1e-3, substeps=2,
                     contact_links=CONTACTS, ground_z=0.0)
    refs, warm, initial_waist = plugin.on_start(robot.state)
    est = FloatingBaseEstimator(model, CONTACTS)
    est_state = est.init(robot.state)

    from qppvm_tpu.runtime.contact_switch import LegLiftPhases
    phases = LegLiftPhases(settle=100, shift=args.shift, dwell=100,
                           unload=150, lift=args.lift, hold=0,
                           lower=args.lower, reload=args.reload)
    gait = GaitScript(model, plugin, refs, initial_waist,
                      order=("foot_hl", "foot_fl", "foot_hr", "foot_fr"),
                      stride=(args.stride_x, 0.0), n_strides=args.strides,
                      shift_mode=args.shift_mode, phases=phases,
                      touch_depth=args.touch_depth,
                      lift_height=args.lift_height, margin=args.margin)
    print(f"total ticks {gait.total} ({gait.stride_ticks}/stride)")
    x0 = float(robot.state.base_pos[0])
    import jax.numpy as jnp
    gates = jnp.ones(len(CONTACTS), jnp.float32)
    n_fail = 0
    t_start = time.time()
    for i in range(gait.total):
        if args.no_est:
            state = robot.state
        else:
            imu = robot.get_imu()
            state, est_state = est.update(
                est_state, robot.get_motor_position(),
                robot.get_motor_velocity(), imu.orientation,
                imu.angular_velocity, active=gates)
        refs_t = gait.refs_at(i, state)
        gates = refs_t["contacts"]["active"]
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        if bool(aux.solver_failed):
            n_fail += 1
            kin_f = kinematics.fk(model, robot.state)
            com = np.asarray(kinematics.com(model, kin_f)[1])[:2]
            feet = {c: np.round(np.asarray(
                kin_f.p[model.link_index(c)]), 3) for c in CONTACTS}
            print(f"  FAIL tick {i} prim={float(aux.prim_res):.2e} "
                  f"com={np.round(com,3)} gates={np.asarray(gates).round(2)}")
            print(f"       feet={feet} fz={np.asarray(aux.wrenches)[:,2].round(1)}")
            if n_fail > 5:
                break
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        up = float(robot.state.base_rot[2, 2])
        if up < 0.7:
            print(f"  FELL at tick {i}")
            break
        if i % 400 == 0:
            kin = kinematics.fk(model, robot.state)
            feet_x = [float(kin.p[model.link_index(c)][0]) for c in CONTACTS]
            feet_y = [float(kin.p[model.link_index(c)][1]) for c in CONTACTS]
            print(f"t{i:5d} stride{i // gait.stride_ticks} up={up:.3f} "
                  f"x={float(robot.state.base_pos[0]):+.3f} "
                  f"z={float(robot.state.base_pos[2]):.3f} "
                  f"feet_x={np.round(feet_x, 3)} feet_y={np.round(feet_y, 2)}")
    x1 = float(robot.state.base_pos[0])
    up = float(robot.state.base_rot[2, 2])
    kin = kinematics.fk(model, robot.state)
    feet_x = [float(kin.p[model.link_index(c)][0]) for c in CONTACTS]
    print(f"DONE in {time.time()-t_start:.0f}s: dx={x1-x0:+.3f} up={up:.3f} "
          f"fails={n_fail} feet_x={np.round(feet_x, 3)}")


if __name__ == "__main__":
    main()
