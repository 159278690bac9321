"""Sampling-MPC benchmark (BASELINE config 5): domain-randomized WBC-in-the-
loop rollouts batched per planning step, sharded over the device mesh.

Prints ONE JSON line: QP-solves/s sustained inside the MPC rollout fan-out
(each rollout step runs a full WBC QP), plus planning-step wall time.

Usage: python bench_mpc.py [--samples 512] [--horizon 8] [--cpu]
"""
import argparse
import dataclasses
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--horizon", type=int, default=8)
    ap.add_argument("--robot", default="humanoid")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from qppvm_tpu.model import kinematics, zoo
    from qppvm_tpu.mpc.rollout import RolloutConfig
    from qppvm_tpu.mpc.sampling import MPPIConfig, SamplingMPC
    from qppvm_tpu.parallel import mesh as meshlib
    from qppvm_tpu.plugins.force_acc import ForceAccPlugin

    model = zoo.by_name(args.robot)
    contacts = (("l_sole", "r_sole") if args.robot in ("humanoid", "biped")
                else ("foot_fl", "foot_fr", "foot_hr", "foot_hl"))
    plugin = ForceAccPlugin(model, contact_links=contacts,
                            waist_link="pelvis", iters=20)
    st = model.home_state()
    kin = kinematics.fk(model, st)
    foot_z = min(float(kin.p[model.link_index(c)][2]) for c in contacts)
    st = dataclasses.replace(
        st, base_pos=st.base_pos - jnp.asarray([0.0, 0.0, foot_z]))
    refs, warm, _ = plugin.on_start(st)

    mesh = meshlib.make_mesh() if len(jax.devices()) > 1 else None
    mppi = MPPIConfig(n_samples=args.samples, horizon=args.horizon,
                      push_std=30.0)
    rcfg = RolloutConfig(horizon=args.horizon, qp_iters=10)
    mpc = SamplingMPC(plugin, mppi, rcfg, mesh=mesh)
    U = mpc.init_plan()
    key = jax.random.PRNGKey(0)

    U2, info = mpc.plan(key, st, refs, warm, U)
    U2.block_until_ready()  # compile
    import numpy as np
    if not np.isfinite(float(info["cost_mean"])):
        raise RuntimeError("MPC rollout cost is non-finite — rollouts "
                           "diverged; numbers would be bogus")
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        U2, info = mpc.plan(jax.random.PRNGKey(i), st, refs, warm, U2)
    U2.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    qp_solves = args.samples * args.horizon
    print(json.dumps({
        "metric": "mpc_qp_solves_per_s",
        "value": round(qp_solves / dt, 1),
        "unit": "solves/s",
        "vs_baseline": round((qp_solves / dt) / 10000.0, 3),
        "plan_step_ms": round(dt * 1e3, 1),
        "samples": args.samples,
        "horizon": args.horizon,
        "cost_mean": float(info["cost_mean"]),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
