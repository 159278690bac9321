"""Checkpoint/resume: a resumed session continues bit-identically."""
import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import zoo
from qppvm_tpu.plugins.qppvm import QPPVMPlugin
from qppvm_tpu.runtime import checkpoint
from qppvm_tpu.runtime.robot_interface import SimRobot


def test_session_roundtrip_bit_identical(tmp_path):
    model = zoo.arm7()
    plugin = QPPVMPlugin(model, left_ee="arm1_7", right_ee="arm1_7", iters=30)
    robot = SimRobot(model)
    refs, warm, _ = plugin.on_start(robot.state)

    # advance a few ticks to populate warm starts
    for _ in range(5):
        tau, warm, _ = plugin.control_loop(robot.state, refs, warm)
        robot.set_reference(tau_ref=tau)
        robot.move()

    path = checkpoint.save_session(str(tmp_path / "session"),
                                   state=robot.state, refs=refs, warm=warm)
    state2, refs2, warm2 = checkpoint.load_session(
        path, state=robot.state, refs=refs, warm=warm)

    tau_a, warm_a, _ = plugin.control_loop(robot.state, refs, warm)
    tau_b, warm_b, _ = plugin.control_loop(state2, refs2, warm2)
    np.testing.assert_array_equal(np.asarray(tau_a), np.asarray(tau_b))


def test_shape_mismatch_rejected(tmp_path):
    model = zoo.arm7()
    plugin = QPPVMPlugin(model, left_ee="arm1_7", right_ee="arm1_7", iters=20)
    robot = SimRobot(model)
    refs, warm, _ = plugin.on_start(robot.state)
    path = checkpoint.save(str(tmp_path / "ck"), {"q": robot.state.q})
    try:
        checkpoint.load(path, {"q": jnp.zeros(3)})
        assert False, "should have raised"
    except ValueError as e:
        assert "shape mismatch" in str(e)
