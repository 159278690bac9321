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
