"""Tune the footstep-recovery MPC: push magnitude vs lean-only vs stepping."""
import jax
jax.config.update("jax_platforms", "cpu")

import argparse
import dataclasses
import numpy as np
import jax.numpy as jnp

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.mpc.rollout import RolloutConfig, make_swing_primitive
from qppvm_tpu.mpc.sampling import MPPIConfig, SamplingMPC
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")


def run(push_vy, step_recovery, seed=0, ticks=700, verbose=True):
    model = zoo.quadruped()
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=40,
                            switchable_contacts=True,
                            use_friction_cones=True, mu=0.5,
                            foot_tasks_6d=False)
    st0 = standing_state(model, CONTACTS)
    robot = SimRobot(model, state=st0, dt=1e-3, substeps=2,
                     contact_links=CONTACTS, mu=1.3)
    refs, warm, initial_waist = plugin.on_start(robot.state)

    H, rdt = 10, 0.04
    mppi = MPPIConfig(n_samples=32, horizon=H, noise_std=0.25,
                      push_std=10.0, step_recovery=step_recovery,
                      theta_noise_std=1.5, dxy_noise_std=0.08)
    rcfg = RolloutConfig(horizon=H, qp_iters=12, dt=rdt, mu=1.3)
    mpc = SamplingMPC(plugin, mppi, rcfg)
    U = mpc.init_plan()
    theta = mpc.init_theta() if step_recovery else None
    swing = mpc.swing
    key = jax.random.PRNGKey(seed)

    waist_p = initial_waist
    plan_every = 40
    t_plan0 = 0
    span = H * rdt
    fell = False
    max_fail = 0.0
    for i in range(ticks):
        state = robot.state
        if i % plan_every == 0:
            key, k = jax.random.split(key)
            if step_recovery:
                (U, theta), info = mpc.plan_step(k, state, refs, warm, U,
                                                 theta)
            else:
                U, info = mpc.plan(k, state, refs, warm, U)
            max_fail = max(max_fail, float(info["solver_fail_frac"]))
            U = SamplingMPC.shift_plan(U)
            t_plan0 = i
        waist_p = waist_p + U[0] * 1e-3
        refs_t = dict(refs)
        wt = dict(refs_t["waist_task"])
        wt["p"] = waist_p
        refs_t["waist_task"] = wt
        if step_recovery:
            t_frac = jnp.asarray(((i - t_plan0) * 1e-3) / span, jnp.float32)
            refs_t = swing(refs_t, theta, t_frac)
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        if i == 200:   # lateral shove
            bv = robot.state.base_vel.at[4].add(push_vy)
            robot.state = dataclasses.replace(robot.state, base_vel=bv)
        up = float(robot.state.base_rot[2, 2])
        z = float(robot.state.base_pos[2])
        if up < 0.7 or z < 0.3:
            fell = True
            if verbose:
                print(f"  FELL at tick {i} (up={up:.2f}, z={z:.2f})")
            break
        if verbose and i % 100 == 0:
            kin = kinematics.fk(model, robot.state)
            feet_y = [float(kin.p[model.link_index(c)][1]) for c in CONTACTS]
            gate = (np.asarray(jax.nn.sigmoid(theta["swing"])).round(2)
                    if step_recovery else None)
            print(f"t{i:4d} up={up:.3f} z={z:.3f} "
                  f"com_y={float(robot.state.base_pos[1]):+.3f} "
                  f"feet_y={np.round(feet_y,2)} swing_a={gate}")
    up = float(robot.state.base_rot[2, 2])
    return fell, up, max_fail


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--push", type=float, default=0.9)
    ap.add_argument("--mode", default="both", choices=["lean", "step", "both"])
    args = ap.parse_args()
    if args.mode in ("lean", "both"):
        print(f"LEAN-ONLY push={args.push}")
        fell, up, mf = run(args.push, False)
        print(f"  -> fell={fell} up={up:.3f} max_fail_frac={mf}")
    if args.mode in ("step", "both"):
        print(f"STEP-RECOVERY push={args.push}")
        fell, up, mf = run(args.push, True)
        print(f"  -> fell={fell} up={up:.3f} max_fail_frac={mf}")
