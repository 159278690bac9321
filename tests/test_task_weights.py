"""Runtime task weights (OpenSoT setWeight analog).

Every task's ``ref_init`` exposes a "w" entry in its reference pytree;
assemble scales its rows by it. Weights are dynamic VALUES (not static
attributes), so weight schedules — swing-foot upweighting, per-joint
postural deweighting during contact switching — run inside one compiled
program with static shapes. Capability upgrade over the reference, whose
task weights are compiled-in constants
(/root/reference/src/QPPVMPlugin.cpp:105-106).
"""
import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import dynamics, zoo
from qppvm_tpu.opt.variables import Optvar
from qppvm_tpu.tasks.acceleration import Cartesian, Postural
from qppvm_tpu.tasks.base import AssembleCtx
from qppvm_tpu.tasks.torque import CartesianImpedanceCtrl, JointImpedanceCtrl


def _ctx(model, state, refs, nx):
    data = dynamics.compute_model_data(model, state, need_binv=True)
    return AssembleCtx(model=model, data=data, state=state, refs=refs,
                       nx=nx, dtype=jnp.float32)


def test_acceleration_tasks_scale_with_runtime_weight():
    model = zoo.quadruped()
    state = model.home_state()
    opt = Optvar([("qddot", model.nv)])
    cart = Cartesian("foot", "foot_fl", opt["qddot"], kp=25.0)
    post = Postural("POSTURAL", opt["qddot"])
    data = dynamics.compute_model_data(model, state)
    refs = {"foot": cart.ref_init(model, data, state),
            "POSTURAL": post.ref_init(model, data, state)}
    ctx = _ctx(model, state, refs, opt.size)
    A1, b1 = cart.assemble(ctx)
    P1, c1 = post.assemble(ctx)

    refs2 = {"foot": dict(refs["foot"], w=jnp.asarray(3.0)),
             "POSTURAL": dict(refs["POSTURAL"])}
    wv = np.ones(model.nj, np.float32)
    wv[0:3] = 0.0  # deweight the fl leg joints entirely
    refs2["POSTURAL"]["w"] = jnp.asarray(wv)
    ctx2 = _ctx(model, state, refs2, opt.size)
    A2, b2 = cart.assemble(ctx2)
    P2, c2 = post.assemble(ctx2)

    np.testing.assert_allclose(np.asarray(A2), 3.0 * np.asarray(A1),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b2), 3.0 * np.asarray(b1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(P2[0:3]), 0.0)
    np.testing.assert_array_equal(np.asarray(c2[0:3]), 0.0)
    np.testing.assert_allclose(np.asarray(P2[3:]), np.asarray(P1[3:]),
                               rtol=1e-6)


def test_torque_tasks_scale_with_runtime_weight():
    model = zoo.dual_arm()
    state = model.home_state()
    ee = CartesianImpedanceCtrl("ee", "arm1_7")
    ji = JointImpedanceCtrl("joint_impedance")
    data = dynamics.compute_model_data(model, state)
    refs = {"ee": ee.ref_init(model, data, state),
            "joint_impedance": ji.ref_init(model, data, state)}
    # default weight in ref_init is 1.0
    assert float(refs["ee"]["w"]) == 1.0
    ctx = _ctx(model, state, refs, model.nj)
    A1, b1 = ee.assemble(ctx)
    J1, d1 = ji.assemble(ctx)

    refs2 = {"ee": dict(refs["ee"], w=jnp.asarray(2.0)),
             "joint_impedance": dict(refs["joint_impedance"],
                                     w=0.5 * jnp.ones(model.nj))}
    ctx2 = _ctx(model, state, refs2, model.nj)
    A2, b2 = ee.assemble(ctx2)
    J2, d2 = ji.assemble(ctx2)
    np.testing.assert_allclose(np.asarray(A2), 2.0 * np.asarray(A1),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(J2), 0.5 * np.asarray(J1),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), 0.5 * np.asarray(d1),
                               rtol=1e-6, atol=1e-7)
