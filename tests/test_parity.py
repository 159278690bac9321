"""Torque-trace parity harness (BASELINE.md: <= 1e-3 Nm RMS).

The reference's commanded torque for the QPPVM law, re-derived analytically
(numpy, float64) from first principles of the cascade semantics:

  level 0:  min ||A0 tau - F||^2           (Cartesian impedance rows)
  level 1:  min ||tau - tau_des||^2  s.t.  A0 tau = A0 tau0*
  command:  tau_d = tau + h              (/root/reference/src/QPPVMPlugin.cpp:256)

On unconstrained ticks (torque limits inactive) the cascade has the closed
form  tau = tau_des + A0^T (A0 A0^T)^{-1} (A0 tau0* - A0 tau_des) with
tau0* the regularized least-squares level-0 solution. The framework's jitted
QP cascade must reproduce this trace along the reference's sinusoid
trajectory within 1e-3 Nm RMS.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import dynamics, kinematics, spatial, zoo
from qppvm_tpu.model.robot import RobotState
from qppvm_tpu.plugins.qppvm import QPPVMPlugin
from qppvm_tpu.tasks.base import AssembleCtx

DT = jnp.float64


def _analytic_qppvm_tau(model, state, refs, plugin):
    """Independent numpy float64 implementation of the control law."""
    data = dynamics.compute_model_data(model, state, need_binv=True)
    ctx = AssembleCtx(model=model, data=data, state=state, refs=refs,
                      nx=model.nj, dtype=DT)
    A_r, b_r = plugin.ee_right.assemble(ctx)
    A_l, b_l = plugin.ee_left.assemble(ctx)
    A0 = np.concatenate([np.asarray(A_r, np.float64),
                         np.asarray(A_l, np.float64)])
    b0 = np.concatenate([np.asarray(b_r, np.float64),
                         np.asarray(b_l, np.float64)])
    A1, b1 = plugin.joint_task.assemble(ctx)
    A1 = np.asarray(A1, np.float64)
    b1 = np.asarray(b1, np.float64)
    n = model.nj

    # level 0: regularized least squares (reg -> the solver's tiny Tikhonov)
    reg = 1e-8 * (np.trace(A0.T @ A0) / n + 1.0)
    x0 = np.linalg.solve(A0.T @ A0 + reg * np.eye(n), A0.T @ b0)
    # level 1: A1 = I -> project tau_des onto {A0 x = A0 x0}
    tau_des = b1
    G = A0 @ A0.T
    lam = np.linalg.solve(G + 1e-12 * np.eye(G.shape[0]),
                          A0 @ x0 - A0 @ tau_des)
    tau = tau_des + A0.T @ lam
    return tau + np.asarray(data.h, np.float64), np.asarray(data.h, np.float64)


def test_torque_trace_matches_analytic_cascade():
    model = zoo.dual_arm()
    plugin = QPPVMPlugin(model, iters=120, dtype=DT)
    state = model.home_state().astype(DT)
    refs, warm, start_pose = plugin.on_start(state)

    rng = np.random.default_rng(0)
    rms_acc = []
    for k in range(15):
        t = 0.2 * k
        # follow the reference sinusoid + small state perturbations so the
        # trace covers a real trajectory neighborhood
        q = model.q_home.astype(DT) + 0.1 * jnp.asarray(
            rng.uniform(-1, 1, model.nj), DT)
        qd = 0.2 * jnp.asarray(rng.uniform(-1, 1, model.nj), DT)
        state = RobotState.init(model, q=q, qd=qd, dtype=DT)
        refs = dict(refs)
        refs["LEFT_ARM"] = plugin.make_refs(start_pose, t)
        tau_fw, warm, aux = plugin.control_loop(state, refs, warm)
        assert not bool(aux.solver_failed)
        tau_an, h = _analytic_qppvm_tau(model, state, refs, plugin)
        # only compare unconstrained ticks (limits inactive in both)
        margin = np.asarray(model.tau_max, np.float64) - np.abs(tau_an - h)
        if np.min(margin) < 1.0:
            continue
        rms = float(np.sqrt(np.mean((np.asarray(tau_fw) - tau_an) ** 2)))
        rms_acc.append(rms)

    assert len(rms_acc) >= 10, "too few unconstrained ticks to compare"
    assert np.max(rms_acc) < 1e-3, (np.max(rms_acc), rms_acc)


def test_force_acc_tau_matches_manual_reconstruction():
    """ForceAcc torque reconstruction parity: tau = ID(qddot) - J_c^T f
    recomputed independently in float64 from the plugin's own (qddot, f)."""
    from qppvm_tpu.plugins.force_acc import ForceAccPlugin

    model = zoo.quadruped()
    plugin = ForceAccPlugin(model, iters=100, dtype=DT)
    st = model.home_state().astype(DT)
    kin = kinematics.fk(model, st)
    contacts = plugin.contact_links
    foot_z = min(float(kin.p[model.link_index(c)][2]) for c in contacts)
    st = dataclasses.replace(
        st, base_pos=st.base_pos - jnp.asarray([0.0, 0.0, foot_z], DT))
    refs, warm, _ = plugin.on_start(st)
    tau, warm, aux = plugin.control_loop(st, refs, warm)
    assert not bool(aux.solver_failed)

    # independent reconstruction
    qddot = jnp.asarray(aux.qddot, DT)
    tau_full = dynamics.inverse_dynamics(model, st, qddot)
    data = dynamics.compute_model_data(model, st)
    tau_c = jnp.zeros(model.nv, DT)
    for ci, cl in enumerate(contacts):
        Jc = dynamics.frame_data(model, data, cl)[2][:3]
        tau_c = tau_c + Jc.T @ jnp.asarray(aux.wrenches[ci], DT)
    tau_manual = (tau_full - tau_c)[6:]
    rms = float(jnp.sqrt(jnp.mean((tau - tau_manual) ** 2)))
    assert rms < 1e-6, rms
