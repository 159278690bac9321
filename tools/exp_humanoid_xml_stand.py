"""Tune the published-humanoid (Gymnasium humanoid.xml) closed-loop stand."""
import jax
jax.config.update("jax_platforms", "cpu")

import argparse
import dataclasses
import os

import jax.numpy as jnp
import numpy as np

import mujoco

from qppvm_tpu.model import kinematics
from qppvm_tpu.model.mjcf import load_mjcf
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.robot_interface import SimRobot

ASSETS = os.path.join(os.path.dirname(mujoco.__file__), "..", "gymnasium",
                      "envs", "mujoco", "assets")
HUMANOID = os.path.abspath(os.path.join(ASSETS, "humanoid.xml"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=800)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--com-k", type=float, default=0.0,
                    help="CoM-over-feet waist servo gain (m per m per s)")
    ap.add_argument("--fz-min", type=float, default=5.0)
    ap.add_argument("--com-w", type=float, default=1.0)
    ap.add_argument("--com-kp", type=float, default=25.0)
    ap.add_argument("--drive-d", type=float, default=2.0)
    ap.add_argument("--kp-c", type=float, default=1e5)
    ap.add_argument("--kd-c", type=float, default=800.0)
    args = ap.parse_args()

    model = load_mjcf(HUMANOID, tip_frames=True)
    contacts = ("left_foot_tip", "right_foot_tip")
    print("links:", model.link_names)
    print("frames:", [f[0] for f in model.frames])
    # Hertz-patch contact: a 7.5 cm rubber sphere under ~225 N flattens
    # to a ~1.2 cm contact patch — modeled as a 4-point patch in the sim
    # and a 6D wrench with a matching CoP/moment box in the QP. Pure point
    # contact leaves the ankle-less biped ZERO pitch authority (measured:
    # clean forward topple from 15 mm of CoM offset with every task
    # healthy).
    PR = 0.012
    plugin = ForceAccPlugin(model, contact_links=contacts,
                            waist_link="pelvis", iters=args.iters,
                            fz_min=args.fz_min, foot_tasks_6d=False,
                            use_friction_cones=True, mu=0.8, wrench_dim=6,
                            moment_box=(450 * PR, 450 * PR, 1.0),
                            postural_kp=25.0,
                            use_com_task=True, com_task_weight=args.com_w,
                            com_kp=args.com_kp, use_joint_limits=True)
    offsets = {}
    sim_contacts = []
    for c in contacts:
        li, E, p = model.frame_spec(c)
        link = model.link_names[li]
        sim_contacts.append(link)
        p = np.asarray(p)
        offsets[link] = [tuple(p + [PR, 0, 0]), tuple(p + [-PR, 0, 0]),
                         tuple(p + [0, PR, 0]), tuple(p + [0, -PR, 0])]
    st = model.home_state()
    kin = kinematics.fk(model, st)
    tip_z = min(float(kinematics.link_pose(model, kin, c)[1][2])
                for c in contacts)
    st = dataclasses.replace(
        st, base_pos=st.base_pos - jnp.asarray([0, 0, tip_z],
                                               st.base_pos.dtype))
    # sphere feet = ONE point per foot carrying ~225 N: kp 1e4 meant
    # 2.2 cm penetration and a zeta~0.1 vertical bounce (fz oscillating
    # 150-360 N); stiff + damped keeps the plant quiet under the QP
    robot = SimRobot(model, state=st, dt=1e-3, substeps=4,
                     contact_links=tuple(sim_contacts), ground_z=0.0,
                     contact_offsets=offsets, contact_kp=args.kp_c,
                     contact_kd=args.kd_c)
    # Light drive damping (reference semantics: the drives keep a softened
    # PD, never zero — /root/reference/src/ForceAcc.cpp:33-39). Without it
    # the published humanoid's long light arms flail unstably under pure
    # torque control (measured: shoulders wind to +-0.9 rad and the torso
    # pitch follows while the pelvis stays level).
    robot.set_damping(args.drive_d * jnp.ones(model.nj, jnp.float32))
    refs, warm, initial_waist = plugin.on_start(robot.state)
    # balance objective: CoM over the feet midpoint at its initial height
    kin_s = kinematics.fk(model, robot.state)
    fm0 = np.mean([np.asarray(kinematics.link_pose(model, kin_s, c)[1])
                   for c in contacts], axis=0)
    com_s = np.asarray(kinematics.com(model, kin_s)[1])
    cr = dict(refs["COM"])
    cr["p"] = jnp.asarray([fm0[0], fm0[1], com_s[2]], jnp.float32)
    refs["COM"] = cr
    z0 = float(robot.state.base_pos[2])
    kin0 = kinematics.fk(model, robot.state)
    feet_mid = np.mean([np.asarray(kinematics.link_pose(model, kin0, c)[1])
                        for c in contacts], axis=0)
    com0 = np.asarray(kinematics.com(model, kin0)[1])
    print(f"z0={z0:.3f} feet_mid={feet_mid.round(3)} com0={com0.round(3)}")

    waist_p = np.asarray(initial_waist, np.float64)
    n_fail = 0
    com_prev = None
    for i in range(args.ticks):
        state = robot.state
        refs_t = dict(refs)
        if args.com_k > 0.0:
            kin_i = kinematics.fk(model, state)
            com = np.asarray(kinematics.com(model, kin_i)[1])
            com_vel = (np.zeros(3) if com_prev is None
                       else (com - com_prev) / 1e-3)
            com_prev = com
            fm = np.mean([np.asarray(
                kinematics.link_pose(model, kin_i, c)[1]) for c in contacts],
                axis=0)
            # DCM outer loop on the CoM-task reference: place the commanded
            # CoM OPPOSITE the capture-point error (the only pitch-braking
            # channel with point feet / no ankles)
            om = np.sqrt(max(com[2] - fm[2], 0.1) / 9.81)
            dcm = com[:2] + om * com_vel[:2]
            com_cmd = fm[:2] - args.com_k * (dcm - fm[:2])
            cr = dict(refs_t["COM"])
            cr["p"] = jnp.asarray([com_cmd[0], com_cmd[1], com_s[2]],
                                  jnp.float32)
            refs_t["COM"] = cr
            # the waist follows the same offset so the two tasks agree
            wt = dict(refs_t["waist_task"])
            wp = np.asarray(initial_waist, np.float64).copy()
            wp[:2] += (com_cmd - com_s[:2])
            waist_p = wp
            wt["p"] = jnp.asarray(wp, jnp.float32)
            refs_t["waist_task"] = wt
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        if bool(aux.solver_failed):
            n_fail += 1
            if n_fail < 4:
                print(f"  FAIL tick {i} prim={float(aux.prim_res):.2e}")
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        if i % 100 == 0:
            kin_i = kinematics.fk(model, robot.state)
            com = np.asarray(kinematics.com(model, kin_i)[1])
            up = float(robot.state.base_rot[2, 2])
            pelv = np.asarray(kinematics.link_pose(model, kin_i, "pelvis")[1])
            print(f"t{i:4d} up={up:.3f} z={float(robot.state.base_pos[2]):.3f} "
                  f"com_xy={com[:2].round(3)} "
                  f"pelv_x={pelv[0]:+.3f} ref_x={waist_p[0]:+.3f} "
                  f"fz={np.asarray(aux.wrenches)[:, 2].round(1)}")
        up = float(robot.state.base_rot[2, 2])
        if up < 0.8 or float(robot.state.base_pos[2]) < 0.6 * z0:
            print(f"FELL at {i}")
            break
    print(f"DONE: z {z0:.3f}->{float(robot.state.base_pos[2]):.3f} "
          f"up={float(robot.state.base_rot[2,2]):.3f} fails={n_fail}")


if __name__ == "__main__":
    main()
