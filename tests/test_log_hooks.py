"""Component self-logging hooks: model->log / autostack->log / solver->log
(/root/reference/src/QPPVMPlugin.cpp:54,227,250,325)."""
import numpy as np

from qppvm_tpu.model import dynamics, zoo
from qppvm_tpu.model.interface import ModelInterface
from qppvm_tpu.opt import hierarchy
from qppvm_tpu.plugins.qppvm import QPPVMPlugin
from qppvm_tpu.runtime.logger import TraceBuffer


def test_model_log(tmp_path):
    mi = ModelInterface.get_model("arm7")
    trace = TraceBuffer(str(tmp_path / "log"), capacity=8)
    mi.init_log(trace, capacity=16)
    assert trace.capacity == 16
    mi.update()
    mi.log()
    trace.tick()
    mi.log()
    out = trace.flush()
    data = np.load(out)
    assert data["model/q"].shape[0] == 2  # flush trims to recorded samples
    assert "model/com" in data


def test_stack_and_solver_log(tmp_path):
    model = zoo.dual_arm()
    plugin = QPPVMPlugin(model, iters=30)
    state = model.home_state()
    refs, warm, _ = plugin.on_start(state)
    data = dynamics.compute_model_data(model, state, need_binv=True)
    sd = plugin.stack.build(model, data, state, refs, nx=model.nj,
                            dtype=plugin.dtype)
    x, warm2, infos = hierarchy.solve(sd, warm, eps=plugin.eps, iters=30)
    trace = TraceBuffer(str(tmp_path / "log2"), capacity=4)
    plugin.stack.log(trace, sd, x=x, infos=infos)
    trace.tick()
    out = trace.flush()
    d = np.load(out)
    assert "stack/level0_b" in d and "stack/level1_residual" in d
    assert "solver/level0_prim_res" in d
    assert np.isfinite(d["solver/level0_prim_res"][0])
