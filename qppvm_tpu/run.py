"""Scenario runner CLI: ``python -m qppvm_tpu.run --config configs/<x>.yaml``.

Loads a ScenarioConfig, builds (model, plugin, sim robot), and either runs a
closed-loop control session (ControlLoop @ 1 kHz sim) or — for MPC-enabled
scenarios — one sampling-MPC planning step over the local device mesh.
Replaces the reference's XCM-launched plugin deployment
(/root/reference/src/QPPVMPlugin.cpp:29 REGISTER_XBOT_PLUGIN + hardcoded
config path :50-51) with a declarative, reproducible entry point.
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="scenario YAML path")
    ap.add_argument("--seconds", type=float, default=1.0,
                    help="closed-loop sim duration")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--trace", default=None,
                    help="TraceBuffer output path (.npz/.mat)")
    ap.add_argument("--mpc-steps", type=int, default=1,
                    help="planning steps for MPC scenarios")
    ap.add_argument("--samples", type=int, default=None,
                    help="override mpc.n_samples (e.g. small for CPU smoke)")
    ap.add_argument("--horizon", type=int, default=None,
                    help="override mpc.horizon")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from qppvm_tpu import config as cfgmod

    cfg = cfgmod.load_scenario(args.config)
    if args.samples is not None:
        cfg.mpc.n_samples = args.samples
    if args.horizon is not None:
        cfg.mpc.horizon = args.horizon
    print(f"[{cfg.name}] {cfg.description}")
    model = cfgmod.build_model(cfg)
    plugin = cfgmod.build_plugin(cfg, model)

    if cfg.mpc.enabled:
        _run_mpc(cfg, cfgmod, model, plugin, args)
    else:
        _run_loop(cfg, cfgmod, model, plugin, args)


def _run_loop(cfg, cfgmod, model, plugin, args):
    import numpy as np

    from qppvm_tpu.runtime.logger import TraceBuffer
    from qppvm_tpu.runtime.plugin import ControlLoop
    from qppvm_tpu.runtime.trajectory import qppvm_sinusoid

    robot = cfgmod.build_sim(cfg, model)
    trace = TraceBuffer(args.trace, capacity=30000) if args.trace else None

    ref_gen = None
    if cfg.plugin.type == "qppvm" and cfg.plugin.sine_ref:
        def ref_gen(t, ctx):
            refs = dict(ctx["refs"])
            start = ctx["start"]
            refs["LEFT_ARM"] = {"R": start["R"],
                                "p": qppvm_sinusoid(start["p"], t),
                                "v": start["v"]}
            return refs
    elif cfg.plugin.type == "force_acc":
        def ref_gen(t, ctx):
            # squat: waist ref descends 0.1 m (/root/reference/src/ForceAcc.cpp:181)
            return plugin.squat_refs(ctx["refs"], ctx["start"],
                                     depth=min(0.1, 0.1 * t))

    loop = ControlLoop(plugin, robot, period=cfg.sim.dt, trace=trace,
                       ref_generator=ref_gen)
    stats = loop.run(args.seconds)
    out = {
        "scenario": cfg.name,
        "seconds": args.seconds,
        "p50_ms": round(stats.p50_ms, 3),
        "p99_ms": round(stats.p99_ms, 3),
        "deadline_misses": stats.deadline_misses(cfg.sim.dt),
        "final_q_norm": round(float(np.linalg.norm(
            np.asarray(robot.state.q))), 4),
    }
    if model.floating:
        out["final_base_z"] = round(float(robot.state.base_pos[2]), 4)
    if trace is not None:
        out["trace"] = trace.flush()
    print(json.dumps(out))


def _run_mpc(cfg, cfgmod, model, plugin, args):
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs), (cfg.mpc.mesh_axis,)) if len(devs) > 1 \
        else None
    mpc = cfgmod.build_mpc(cfg, plugin, mesh=mesh)

    state = model.home_state()
    refs, warm, _ = plugin.on_start(state)
    U = mpc.init_plan()
    key = jax.random.PRNGKey(0)
    infos = []
    for i in range(args.mpc_steps):
        key, sub = jax.random.split(key)
        U, info = mpc.plan(sub, state, refs, warm, U)
        infos.append(info)
    jax.block_until_ready(U)
    print(json.dumps({
        "scenario": cfg.name,
        "mpc_steps": args.mpc_steps,
        "n_samples": cfg.mpc.n_samples,
        "horizon": cfg.mpc.horizon,
        "devices": len(devs),
        "plan_norm": round(float(np.linalg.norm(np.asarray(U))), 4),
    }))


if __name__ == "__main__":
    main()
