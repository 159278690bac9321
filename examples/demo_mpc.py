"""Demo: both MPC layers on the quadruped.

1. Centroidal DDP (mpc/ddp_mpc.py) plans a CoM squat; the whole-body
   controller tracks it at 1 kHz in the contact sim.
2. Sampling MPC (mpc/sampling.py) runs one MPPI planning step over
   domain-randomized WBC-in-the-loop rollouts.

Usage: python examples/demo_mpc.py [--cpu] [--ticks 400] [--samples 16]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ticks", type=int, default=400)
    ap.add_argument("--samples", type=int, default=16)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from qppvm_tpu.model import kinematics, zoo
    from qppvm_tpu.mpc.ddp_mpc import CentroidalMPC, CentroidalMPCConfig
    from qppvm_tpu.mpc.rollout import RolloutConfig
    from qppvm_tpu.mpc.sampling import MPPIConfig, SamplingMPC
    from qppvm_tpu.plugins.force_acc import ForceAccPlugin
    from qppvm_tpu.runtime.robot_interface import SimRobot, standing_state

    CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")
    model = zoo.quadruped()
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=40)
    robot = SimRobot(model, state=standing_state(model, CONTACTS),
                     dt=1e-3, substeps=4, contact_links=CONTACTS)
    refs, warm, initial_waist = plugin.on_start(robot.state)

    # ---- 1. centroidal DDP plans, WBC tracks ---------------------------
    mpc = CentroidalMPC(model, CONTACTS,
                        CentroidalMPCConfig(horizon=15, dt=0.02,
                                            iterations=4))
    U = mpc.init_plan(robot.state)
    kin0 = kinematics.fk(model, robot.state)
    _, com0 = kinematics.com(model, kin0)
    p_ref = jnp.asarray(com0) - jnp.asarray([0.0, 0.0, 0.04])

    res = None
    for i in range(args.ticks):
        state = robot.state
        if i % 20 == 0:
            res, params = mpc.plan(state, p_ref, U)
            U = res.U
        waist_p = CentroidalMPC.waist_ref_from_plan(res, k=5)
        refs_t = dict(refs)
        wt = dict(refs_t["waist_task"])
        wt["p"] = initial_waist + (waist_p - jnp.asarray(com0))
        refs_t["waist_task"] = wt
        tau, warm, aux = plugin.control_loop(state, refs_t, warm)
        robot.set_reference(tau_ref=tau, q_ref=state.q)
        robot.move()
        if i % 100 == 0:
            kin = kinematics.fk(model, robot.state)
            _, com = kinematics.com(model, kin)
            F = np.asarray(res.U[0]).reshape(len(CONTACTS), 3)
            print(f"[ddp] tick {i:4d}: com z={float(com[2]):.4f} "
                  f"(target {float(p_ref[2]):.4f}) "
                  f"planned fz={np.round(F[:, 2], 1)}")

    kin = kinematics.fk(model, robot.state)
    _, com = kinematics.com(model, kin)
    print(f"[ddp] done: com z {float(com0[2]):.4f} -> {float(com[2]):.4f} "
          f"(target {float(p_ref[2]):.4f})")

    # ---- 2. one sampling-MPC (MPPI) planning step ----------------------
    mppi = MPPIConfig(n_samples=args.samples, horizon=4, push_std=30.0)
    smpc = SamplingMPC(plugin, mppi, RolloutConfig(horizon=4, qp_iters=8))
    Us = smpc.init_plan()
    Us, info = smpc.plan(jax.random.PRNGKey(0), robot.state, refs, warm, Us)
    print(f"[mppi] {args.samples} rollouts x 4 steps: "
          f"cost mean={float(info['cost_mean']):.3f} "
          f"min={float(info['cost_min']):.3f}")


if __name__ == "__main__":
    main()
