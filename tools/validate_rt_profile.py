"""Closed-loop validation of an RT solver profile (CPU, exact physics sim).

The throughput sweep (tools/tune_solver.py) measures open-loop chained
residuals on a *fixed* state; a profile is only deployable if the CLOSED
loop holds — evolving state, contact forces supporting the weight, no solver
failures. This runs the BASELINE config-4-style 500-tick double-support
stand under a chosen plugin configuration + solver profile and prints one
JSON verdict line. The separation mirrors real RT practice: qpOASES
deployments tune per-robot solver options the same way
(/root/reference/src/QPPVMPlugin.cpp:190-196 sets per-level options).

Usage:
  python tools/validate_rt_profile.py --profile fast            # rho_updates=0
  python tools/validate_rt_profile.py --profile default
  python tools/validate_rt_profile.py --profile fast --cones    # hard stack
"""
import argparse
import dataclasses
import json

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qppvm_tpu.model import kinematics, zoo  # noqa: E402
from qppvm_tpu.plugins.force_acc import ForceAccPlugin  # noqa: E402
from qppvm_tpu.runtime.robot_interface import SimRobot  # noqa: E402

CONTACTS = ("l_sole", "r_sole")
FOOT_PATCH = [[0.10, 0.05, 0.0], [0.10, -0.05, 0.0],
              [-0.06, 0.05, 0.0], [-0.06, -0.05, 0.0]]

PROFILES = {
    "default": dict(rho_updates=1),
    "fast": dict(rho_updates=0),
    "fast_w8": dict(rho_updates=0, warm_kinv_iters=8),
    # equality-elimination era (opt/qp.py n_eq_*): trimmed NS + ADMM budgets
    "eq_w6": dict(rho_updates=0, warm_kinv_iters=6),       # pair w/ --iters 16
    "eq_w4": dict(rho_updates=0, warm_kinv_iters=4),       # pair w/ --iters 10-12
    "eq_w3": dict(rho_updates=0, warm_kinv_iters=3),       # pair w/ --iters 8
    # eq_w4 + trimmed per-tick fixed costs (2 Ruiz sweeps, 5 eq-pinv NS)
    "eq_w4_trim": dict(rho_updates=0, warm_kinv_iters=4, cold_ns_iters=10,
                       scale_iters=2, pinv_ns_iters=5),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="fast", choices=sorted(PROFILES))
    ap.add_argument("--ticks", type=int, default=500)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cones", action="store_true",
                    help="friction cones + 6D wrenches (hard stack)")
    args = ap.parse_args()

    model = zoo.humanoid()
    kw = dict(use_friction_cones=True, mu=0.7, wrench_dim=6) if args.cones \
        else {}
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=args.iters,
                            solver_opts=PROFILES[args.profile], **kw)

    st = model.home_state()
    kin = kinematics.fk(model, st)
    foot_z = min(float(kin.p[model.link_index(c)][2]) for c in CONTACTS)
    st = dataclasses.replace(
        st, base_pos=st.base_pos - jnp.asarray([0.0, 0.0, foot_z],
                                               st.base_pos.dtype))
    robot = SimRobot(model, state=st, dt=1e-3, substeps=4,
                     contact_links=CONTACTS, ground_z=0.0,
                     contact_offsets={c: FOOT_PATCH for c in CONTACTS})
    refs, warm, _ = plugin.on_start(robot.state)
    z0 = float(robot.state.base_pos[2])

    n_fail = 0
    max_res = 0.0
    fz = []
    for i in range(args.ticks):
        tau, warm, aux = plugin.control_loop(robot.state, refs, warm)
        n_fail += int(bool(aux.solver_failed))
        max_res = max(max_res, float(aux.prim_res))
        robot.set_reference(tau_ref=tau, q_ref=robot.state.q)
        robot.move()
        if i > args.ticks * 2 // 5:
            fz.append(np.asarray(aux.wrenches)[:, 2])
    z1 = float(robot.state.base_pos[2])
    fz_mean = np.mean(fz, axis=0)
    m, _ = kinematics.com(model, kinematics.fk(model, robot.state))
    weight = float(m) * 9.81

    ok = (n_fail == 0 and abs(z1 - z0) < 0.06
          and abs(float(fz_mean.sum()) - weight) < 0.3 * weight
          and bool(np.all(fz_mean > 10.0)))
    print(json.dumps({
        "profile": args.profile, "cones": bool(args.cones),
        "iters": args.iters, "ticks": args.ticks, "deployable": ok,
        "solver_failures": n_fail, "max_prim_res": max_res,
        "base_drift_m": round(z1 - z0, 4),
        "sum_fz_vs_weight": round(float(fz_mean.sum()) / weight, 3),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
