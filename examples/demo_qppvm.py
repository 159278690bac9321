"""Demo: QPPVM dual-arm torque impedance control with the moving sinusoid
reference (the reference plugin's experiment,
/root/reference/src/QPPVMPlugin.cpp:217-223), run through the public
runtime: ControlLoop + SimRobot + TraceBuffer.

Usage: python examples/demo_qppvm.py [--seconds 2.0] [--cpu]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--log", default="/tmp/qppvm_log")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from qppvm_tpu.model import kinematics, zoo
    from qppvm_tpu.plugins.qppvm import QPPVMPlugin
    from qppvm_tpu.runtime.logger import TraceBuffer
    from qppvm_tpu.runtime.plugin import ControlLoop
    from qppvm_tpu.runtime.robot_interface import SimRobot
    from qppvm_tpu.runtime.trajectory import qppvm_sinusoid

    model = zoo.dual_arm()
    plugin = QPPVMPlugin(model, iters=60)
    robot = SimRobot(model, dt=1e-3, substeps=2)
    trace = TraceBuffer(args.log, capacity=30000)

    def ref_gen(t, ctx):
        refs = dict(ctx["refs"])
        start = ctx["start"]
        refs["LEFT_ARM"] = {
            "R": start["R"],
            "p": qppvm_sinusoid(start["p"], t),
            "v": start["v"],
        }
        return refs

    loop = ControlLoop(plugin, robot, period=1e-3, trace=trace,
                       ref_generator=ref_gen)
    stats = loop.run(args.seconds)

    kin = kinematics.fk(model, robot.state)
    p = kinematics.link_pose(model, kin, "arm1_7")[1]
    p_ref = qppvm_sinusoid(
        kinematics.link_pose(model, kinematics.fk(model, model.home_state()),
                             "arm1_7")[1], args.seconds - 1e-3)
    err = float(np.linalg.norm(np.asarray(p) - np.asarray(p_ref)))
    out = trace.flush()
    print(f"ran {args.seconds:.1f}s @1kHz | final EE tracking error: "
          f"{err * 1000:.1f} mm")
    print(f"step latency: p50={stats.p50_ms:.2f}ms p99={stats.p99_ms:.2f}ms "
          f"deadline_misses={stats.deadline_misses()}")
    print(f"trace: {out} channels={list(trace.data())}")


if __name__ == "__main__":
    main()
