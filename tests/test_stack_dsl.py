"""AutoStack DSL + Optvar/AffineExpr + SubTask/Indices unit tests."""
import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import dynamics, zoo
from qppvm_tpu.opt.variables import AffineExpr, Optvar
from qppvm_tpu.stack.autostack import AutoStack
from qppvm_tpu.tasks.base import AssembleCtx, Indices, SubTask, Task
from qppvm_tpu.tasks.torque import JointImpedanceCtrl, TorqueLimits


class _ConstTask(Task):
    def __init__(self, name, A, b):
        self.name = name
        self._A = jnp.asarray(A, jnp.float32)
        self._b = jnp.asarray(b, jnp.float32)

    def assemble(self, ctx):
        return self._A, self._b


def _ctx(nx=4):
    model = zoo.arm7()
    state = model.home_state()
    data = dynamics.compute_model_data(model, state)
    return AssembleCtx(model=model, data=data, state=state, refs={}, nx=nx)


def test_plus_aggregates_rows():
    t1 = _ConstTask("a", np.ones((2, 4)), np.ones(2))
    t2 = _ConstTask("b", 2 * np.ones((3, 4)), 2 * np.ones(3))
    agg = t1 + t2
    A, b = agg.assemble(_ctx())
    assert A.shape == (5, 4)
    np.testing.assert_allclose(np.asarray(A[2:]), 2.0)


def test_priority_and_constraints_structure():
    t1 = _ConstTask("a", np.ones((2, 4)), np.ones(2))
    t2 = _ConstTask("b", np.ones((1, 4)), np.ones(1))
    t3 = _ConstTask("c", np.ones((1, 4)), np.ones(1))
    stack = (t1 + t2) / t3
    assert len(stack.levels) == 2
    assert len(stack.levels[0]) == 1  # aggregated
    assert len(stack.levels[1]) == 1


def test_subtask_indices():
    t = _ConstTask("a", np.arange(24).reshape(6, 4), np.arange(6))
    sub = SubTask(t, Indices.range(0, 2))
    A, b = sub.assemble(_ctx())
    assert A.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(b), [0, 1, 2])


def test_indices_range_inclusive():
    assert Indices.range(0, 2) == [0, 1, 2]
    assert Indices.range(3, 5) == [3, 4, 5]


def test_optvar_slicing_and_affine_algebra():
    opt = Optvar([("qddot", 4), ("w1", 3), ("w2", 3)])
    assert opt.size == 10
    q = opt["qddot"]
    w1 = opt["w1"]
    x = jnp.arange(10.0, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(q.value(x)), [0, 1, 2, 3])
    np.testing.assert_allclose(np.asarray(w1.value(x)), [4, 5, 6])
    # vertical concat (OpenSoT `/`)
    both = w1 / opt["w2"]
    np.testing.assert_allclose(np.asarray(both.value(x)), [4, 5, 6, 7, 8, 9])
    # zero-padding trick from the reference (ForceAcc.cpp:81)
    padded = w1 / AffineExpr.zero(10, 3)
    np.testing.assert_allclose(np.asarray(padded.value(x)), [4, 5, 6, 0, 0, 0])
    # matrix composition
    S = 2.0 * jnp.eye(3)
    expr2 = S @ w1
    np.testing.assert_allclose(np.asarray(expr2.value(x)), [8, 10, 12])
    # row selection
    np.testing.assert_allclose(np.asarray(w1.rows([2]).value(x)), [6])


def test_stack_build_shapes_and_bounds():
    model = zoo.arm7()
    state = model.home_state()
    data = dynamics.compute_model_data(model, state)
    jt = JointImpedanceCtrl()
    stack = AutoStack(jt) << TorqueLimits()
    refs = stack.ref_init(model, data, state)
    sd = stack.build(model, data, state, refs, nx=model.nj)
    assert sd.levels[0].A.shape == (model.nj, model.nj)
    # torque-limit bounds shifted by -h
    np.testing.assert_allclose(
        np.asarray(sd.ub), np.asarray(model.tau_max - data.h), rtol=1e-6)


def test_non_world_base_link_tasks():
    """Cartesian tasks accept a non-world base_link (OpenSoT capability;
    the reference only exercises "world",
    /root/reference/src/QPPVMPlugin.cpp:129-152): the task error is zero at
    its own ref_init and the rows equal the FD-tested relative jacobian."""
    import jax.numpy as jnp
    import numpy as np

    from qppvm_tpu.model import dynamics, zoo
    from qppvm_tpu.opt.variables import Optvar
    from qppvm_tpu.tasks.acceleration import Cartesian
    from qppvm_tpu.tasks.base import AssembleCtx
    from qppvm_tpu.tasks.torque import CartesianImpedanceCtrl

    model = zoo.dual_arm()
    state = model.home_state()
    data = dynamics.compute_model_data(model, state, need_binv=True)

    opt = Optvar([("qddot", model.nv)])
    acc = Cartesian("rel_acc", "arm1_7", opt["qddot"], base_link="arm2_4")
    refs = {"rel_acc": acc.ref_init(model, data, state)}
    ctx = AssembleCtx(model=model, data=data, state=state, refs=refs,
                      nx=opt.size, dtype=jnp.float32)
    A, b = acc.assemble(ctx)
    J_rel = dynamics.relative_frame_data(model, data, "arm1_7", "arm2_4")[2]
    np.testing.assert_allclose(np.asarray(A), np.asarray(J_rel), atol=1e-6)
    # at rest with ref = current pose, desired acceleration is zero
    np.testing.assert_allclose(np.asarray(b), 0.0, atol=1e-5)

    imp = CartesianImpedanceCtrl("rel_imp", "arm1_7", base_link="arm2_4",
                                 indices=[0, 1, 2])
    refs2 = {"rel_imp": imp.ref_init(model, data, state)}
    ctx2 = AssembleCtx(model=model, data=data, state=state, refs=refs2,
                       nx=model.nj, dtype=jnp.float32)
    A2, b2 = imp.assemble(ctx2)
    assert A2.shape == (3, model.nj)
    Fs, Fd = imp.spring_damper_force(ctx2)
    np.testing.assert_allclose(np.asarray(Fs), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Fd), 0.0, atol=1e-4)
