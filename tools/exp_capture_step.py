"""Capture-step dichotomy scenario: humanoid in SINGLE SUPPORT, shoved
toward the lifted-foot side.

With one sole of support, a shove that carries the capture point past the
original foothold cannot be answered by leaning or by re-planting the foot
where it was — only a capture STEP (re-plant the swing foot AT A SHIFTED
LOCATION) survives. Capture-point arithmetic on the zoo humanoid
(com z ~ 0.85, sole half-width 0.05, feet at y = +-0.11):
  original foothold captures xi = vy*sqrt(z/g) <= ~0.16  ->  vy <= ~0.55
  a +0.25 m lateral step captures                        ->  vy <= ~1.2
so a shove in between separates lean-only (falls) from step (survives).
"""
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
from qppvm_tpu.runtime.contact_switch import LegLiftPhases, LegLiftScript
from qppvm_tpu.runtime.estimator import FloatingBaseEstimator
from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

CONTACTS = ("l_sole", "r_sole")
PATCH = [[0.10, 0.05, 0.0], [0.10, -0.05, 0.0],
         [-0.06, 0.05, 0.0], [-0.06, -0.05, 0.0]]


def setup():
    model = zoo.humanoid()
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=40,
                            switchable_contacts=True,
                            use_friction_cones=True, mu=0.6, wrench_dim=6,
                            foot_tasks_6d=False)
    st = standing_state(model, CONTACTS)
    offsets = {c: PATCH for c in CONTACTS}
    robot = SimRobot(model, state=st, dt=1e-3, substeps=2,
                     contact_links=CONTACTS, contact_offsets=offsets)
    refs, warm, initial_waist = plugin.on_start(robot.state)
    return model, plugin, robot, refs, warm, initial_waist, offsets


def to_single_support(model, plugin, robot, refs, warm, initial_waist,
                      hold_ticks=100):
    """Drive the validated single-support maneuver to mid-hold; lifted foot
    = l_sole. Returns (state snapshot at mid-hold, warm, script)."""
    phases = LegLiftPhases(settle=150, shift=450, dwell=150, unload=180,
                           lift=250, hold=600, lower=250, reload=200)
    script = LegLiftScript(model, plugin, refs, initial_waist, "l_sole",
                           state=robot.state, phases=phases,
                           lift_height=0.04, swing_kp=100.0, swing_w=3.0)
    t_end = script.t_hold0 + hold_ticks
    for i in range(t_end):
        state = robot.state
        tau, warm, aux = plugin.control_loop(state, script.refs_at(i), warm)
        assert not bool(aux.solver_failed), f"setup tick {i}"
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
    return warm, script


def run_arm(model, plugin, robot, base_refs, warm, offsets, *, push_vy,
            step_recovery, seed=0, ticks=1500, n_samples=24, plan_every=40,
            verbose=True, fixed_theta=None):
    """From the current (single-support) robot state: shove, then run the
    planner closed-loop on ``base_refs`` (double-support nominal refs —
    gates all on, lifted-foot reference at its ORIGINAL foothold)."""
    est = FloatingBaseEstimator(model, CONTACTS)
    est_state = est.init(robot.state)
    # horizon must OUTLIVE the fall it is supposed to foresee: at a 0.32 s
    # horizon the no-step rollouts look fine (the topple lands at ~0.86 s)
    # and the elite sample never steps. 12 x 60 ms = 0.72 s sees it.
    H, rdt = 12, 0.06
    # fail_penalty ~ cost scale, NOT 1e6: from a toppling state EVERY
    # rollout trips the trimmed-budget fail gate, and a dominating penalty
    # erases the cost ranking exactly when planning matters most.
    # theta_noise 2.5: at 1.5 a committed swing logit (>0 from the -4
    # init) is a 2.7-sigma event the 24-sample batch never draws.
    mppi = MPPIConfig(n_samples=n_samples, horizon=H, noise_std=0.2,
                      push_std=10.0, step_recovery=step_recovery,
                      theta_noise_std=2.5, dxy_noise_std=0.12,
                      fail_penalty=100.0)
    rcfg = RolloutConfig(horizon=H, qp_iters=30, dt=rdt, sim_substeps=6)
    mpc = SamplingMPC(plugin, mppi, rcfg, contact_offsets=offsets)
    U = mpc.init_plan()
    theta = mpc.init_theta() if step_recovery else None
    swing = mpc.swing
    key = jax.random.PRNGKey(seed)

    # shove toward the lifted (left, +y) side
    bv = robot.state.base_vel.at[4].add(push_vy)
    robot.state = dataclasses.replace(robot.state, base_vel=bv)

    waist_p = base_refs["waist_task"]["p"]
    span = H * rdt
    span_ticks = int(span * 1e3)
    fell = False
    max_fail = 0.0
    gates = jnp.ones(len(CONTACTS), jnp.float32)
    committed = None        # (theta, start_tick) of an executing step
    n_steps = 0
    for i in range(ticks):
        imu = robot.get_imu()
        state, est_state = est.update(
            est_state, robot.get_motor_position(),
            robot.get_motor_velocity(), imu.orientation,
            imu.angular_velocity, active=gates)
        if fixed_theta is not None and i == 0:
            committed = (jax.tree.map(jnp.asarray, fixed_theta), 0)
            n_steps += 1
        if committed is None and i % plan_every == 0:
            key, k = jax.random.split(key)
            if fixed_theta is not None:
                U, info = mpc.plan(k, state, base_refs, warm, U)
            elif step_recovery:
                (U, theta), info = mpc.plan_step(k, state, base_refs, warm,
                                                 U, theta)
                # COMMIT to the planner's chosen (elite) theta when it is
                # decisive, and execute the swing TO COMPLETION: replanning
                # mid-swing resets the primitive's t_frac and the foot bobs
                # without ever landing (the plan->execution t_frac handoff)
                tb = info["theta_best"]
                a_best = np.asarray(jax.nn.sigmoid(tb["swing"]))
                if a_best.max() > 0.6:
                    committed = (jax.tree.map(jnp.asarray, tb), i)
                    n_steps += 1
            else:
                U, info = mpc.plan(k, state, base_refs, warm, U)
            max_fail = max(max_fail, float(info["solver_fail_frac"]))
            U = SamplingMPC.shift_plan(U)
            # the waist reference FOLLOWS the robot (re-anchor toward the
            # current support centroid): a ref pinned 0.3 m behind a robot
            # that shuffled downwind eventually drags it over (measured:
            # both arms fell identically at tick ~790 from the stretch)
            kin_p = kinematics.fk(model, state)
            fm = jnp.mean(jnp.stack(
                [kin_p.p[model.link_index(c)][:2] for c in CONTACTS]),
                axis=0)
            waist_p = waist_p.at[:2].set(
                waist_p[:2] + 0.5 * (fm - waist_p[:2]))
        waist_p = waist_p + U[0] * 1e-3
        refs_t = dict(base_refs)
        wt = dict(refs_t["waist_task"])
        wt["p"] = waist_p
        refs_t["waist_task"] = wt
        if committed is not None:
            th_c, t0c = committed
            t_frac = jnp.asarray((i - t0c) / span_ticks, jnp.float32)
            refs_t = swing(refs_t, th_c, t_frac)
            if i - t0c >= span_ticks:
                # swing complete: re-anchor the landed foot's base ref at
                # its actual pose (GaitScript-style) and resume planning
                kin_c = kinematics.fk(model, robot.state)
                a_c = np.asarray(jax.nn.sigmoid(th_c["swing"]))
                for ci, cl in enumerate(CONTACTS):
                    if a_c[ci] > 0.5:
                        keyn = cl + "_cartesian"
                        tr = dict(base_refs[keyn])
                        pa = np.asarray(
                            kin_c.p[model.link_index(cl)])
                        tr["p"] = jnp.asarray([pa[0], pa[1], 0.0],
                                              jnp.float32)
                        base_refs[keyn] = tr
                committed = None
        gates = refs_t.get("contacts", {"active": gates})["active"]
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        up = float(robot.state.base_rot[2, 2])
        z = float(robot.state.base_pos[2])
        if up < 0.7 or z < 0.45:
            fell = True
            if verbose:
                print(f"  FELL at tick {i} (up={up:.2f}, z={z:.2f})")
            break
        if verbose and i % 100 == 0:
            kin = kinematics.fk(model, robot.state)
            feet = [np.asarray(kin.p[model.link_index(c)])[:2].round(2)
                    for c in CONTACTS]
            gate = (np.asarray(jax.nn.sigmoid(theta["swing"])).round(2)
                    if step_recovery else None)
            print(f"t{i:4d} up={up:.3f} z={z:.3f} "
                  f"com_y={float(robot.state.base_pos[1]):+.3f} "
                  f"l={feet[0]} r={feet[1]} a={gate} "
                  f"dxy={np.round(np.asarray(theta['dxy']),2) if step_recovery else None}")
    return fell, float(robot.state.base_rot[2, 2]), max_fail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--push", type=float, default=0.9)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mode", default="both",
                    choices=["lean", "step", "both", "fixed"])
    args = ap.parse_args()

    import copy
    model, plugin, robot, refs, warm, initial_waist, offsets = setup()
    warm_ss, script = to_single_support(model, plugin, robot, refs, warm,
                                        initial_waist)
    snap = (robot.state, robot._anchors)
    base_refs = dict(refs)
    wt = dict(base_refs["waist_task"])
    wt["p"] = script.w1           # waist where the maneuver put it
    base_refs["waist_task"] = wt
    kin = kinematics.fk(model, robot.state)
    com = np.asarray(kinematics.com(model, kin)[1])
    print(f"single-support snapshot: com={com.round(3)} "
          f"l_sole_z={float(kin.p[model.link_index('l_sole')][2]):.3f}")

    if args.mode == "fixed":
        # deterministic: execute a FIXED crossover-step theta immediately
        robot.state, robot._anchors = snap
        fell, up, mf = run_arm(model, plugin, robot, base_refs, warm_ss,
                               offsets, push_vy=args.push,
                               step_recovery=True, seed=args.seed,
                               fixed_theta={"swing": jnp.asarray([-8.0, 3.0]),
                                            "t0": jnp.asarray(-3.0),
                                            "dxy": jnp.asarray([0.05, 0.05])})
        print(f"  FIXED -> fell={fell} up={up:.3f} max_fail={mf}")
        return
    for mode, flag in (("lean", False), ("step", True)):
        if args.mode not in (mode, "both"):
            continue
        robot.state, robot._anchors = snap
        print(f"{mode.upper()} push={args.push} seed={args.seed}")
        fell, up, mf = run_arm(model, plugin, robot, base_refs, warm_ss,
                               offsets, push_vy=args.push,
                               step_recovery=flag, seed=args.seed)
        print(f"  -> fell={fell} up={up:.3f} max_fail={mf}")


if __name__ == "__main__":
    main()
