"""Tune the HUMANOID capture-step recovery: a biped genuinely topples from
a lateral shove (unlike the quadruped, which skids/hops out of anything on
the compliant ground), so lean-only-falls vs step-survives is a sharp
dichotomy here."""
import jax
jax.config.update("jax_platforms", "cpu")

import argparse
import dataclasses

import numpy as np
import jax.numpy as jnp

from qppvm_tpu.model import kinematics, zoo
from qppvm_tpu.mpc.rollout import RolloutConfig
from qppvm_tpu.mpc.sampling import MPPIConfig, SamplingMPC
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.estimator import FloatingBaseEstimator
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

CONTACTS = ("l_sole", "r_sole")
PATCH = [[0.10, 0.05, 0.0], [0.10, -0.05, 0.0],
         [-0.06, 0.05, 0.0], [-0.06, -0.05, 0.0]]


def run(push_vy, step_recovery, seed=0, ticks=800, verbose=True,
        plan_every=40, n_samples=24, push_tick=200,
        sim_mu=2.0, sim_kt=5e4, roll=0.0):
    model = zoo.humanoid()
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=40,
                            switchable_contacts=True,
                            use_friction_cones=True, mu=0.6, wrench_dim=6,
                            foot_tasks_6d=False)
    st0 = standing_state(model, CONTACTS)
    offsets = {c: PATCH for c in CONTACTS}
    # high-grip ground (rubber soles on rough concrete): without it the
    # compliant ground lets the robot SLIDE out of any lateral shove and
    # lean-vs-step never differentiates (measured up to 0.8 m/s)
    robot = SimRobot(model, state=st0, dt=1e-3, substeps=2,
                     contact_links=CONTACTS, contact_offsets=offsets,
                     mu=sim_mu, contact_kt=sim_kt)
    refs, warm, initial_waist = plugin.on_start(robot.state)
    est = FloatingBaseEstimator(model, CONTACTS)
    est_state = est.init(robot.state)

    H, rdt = 8, 0.04
    mppi = MPPIConfig(n_samples=n_samples, horizon=H, noise_std=0.2,
                      push_std=10.0, step_recovery=step_recovery,
                      theta_noise_std=1.5, dxy_noise_std=0.1)
    rcfg = RolloutConfig(horizon=H, qp_iters=30, dt=rdt)
    mpc = SamplingMPC(plugin, mppi, rcfg, contact_offsets=offsets)
    U = mpc.init_plan()
    theta = mpc.init_theta() if step_recovery else None
    swing = mpc.swing
    key = jax.random.PRNGKey(seed)

    waist_p = initial_waist
    t_plan0 = 0
    span = H * rdt
    fell = False
    max_fail = 0.0
    fail_log = []
    gates = jnp.ones(len(CONTACTS), jnp.float32)
    for i in range(ticks):
        imu = robot.get_imu()
        state, est_state = est.update(
            est_state, robot.get_motor_position(),
            robot.get_motor_velocity(), imu.orientation,
            imu.angular_velocity, active=gates)
        if i % plan_every == 0:
            key, k = jax.random.split(key)
            if step_recovery:
                (U, theta), info = mpc.plan_step(k, state, refs, warm, U,
                                                 theta)
            else:
                U, info = mpc.plan(k, state, refs, warm, U)
            ff = float(info["solver_fail_frac"])
            max_fail = max(max_fail, ff)
            fail_log.append(round(ff, 2))
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
        gates = refs_t.get("contacts", {"active": gates})["active"]
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        if i == push_tick:   # lateral shove (+ optional roll rate: angular
            # momentum the sole's CoP authority cannot absorb)
            bv = robot.state.base_vel.at[4].add(push_vy).at[0].add(roll)
            robot.state = dataclasses.replace(robot.state, base_vel=bv)
        up = float(robot.state.base_rot[2, 2])
        z = float(robot.state.base_pos[2])
        if up < 0.7 or z < 0.45:
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
                  f"feet_y={np.round(feet_y, 2)} swing_a={gate} "
                  f"dxy={np.round(np.asarray(theta['dxy']), 2) if step_recovery else None}")
    up = float(robot.state.base_rot[2, 2])
    return fell, up, max_fail, fail_log


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--push", type=float, default=0.45)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ticks", type=int, default=800)
    ap.add_argument("--roll", type=float, default=0.0)
    ap.add_argument("--mode", default="both", choices=["lean", "step", "both"])
    args = ap.parse_args()
    if args.mode in ("lean", "both"):
        print(f"LEAN-ONLY push={args.push} seed={args.seed}")
        fell, up, mf, fl = run(args.push, False, seed=args.seed,
                               ticks=args.ticks, roll=args.roll)
        print(f"  -> fell={fell} up={up:.3f} max_fail={mf} plans={fl}")
    if args.mode in ("step", "both"):
        print(f"STEP-RECOVERY push={args.push} seed={args.seed}")
        fell, up, mf, fl = run(args.push, True, seed=args.seed,
                               ticks=args.ticks, roll=args.roll)
        print(f"  -> fell={fell} up={up:.3f} max_fail={mf} plans={fl}")
