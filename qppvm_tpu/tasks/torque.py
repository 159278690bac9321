"""Torque-level tasks & constraints (QPPVM control law).

Re-designs the OpenSoT torque slice the reference exercises:
``tasks::torque::CartesianImpedanceCtrl`` (/root/reference/src/QPPVMPlugin.cpp:129-152),
``tasks::torque::JointImpedanceCtrl`` (:114-118), ``constraints::torque::
TorqueLimits`` (:112,203-205) and ``constraints::torque::JointLimits``
(:169-171, commented there but part of the capability surface).

Decision variable: x = tau_qp (nj,), the torque *on top of* the nonlinear
term h — the plugin adds h after the solve
(/root/reference/src/QPPVMPlugin.cpp:256: ``_tau_d = _tau_d + _h``).

Formulation (documented design choice — this is a re-design, not a port):

- Cartesian impedance: desired wrench F = Kc e_pose - Dc (J u), rows selected
  by ``indices``. Task rows A = (J_s W J_s^T + d I)^{-1} J_s W  (the
  generalized-inverse transpose of J^T under metric W), b = F_s, with
  W = B^{-1} when ``use_inertia_matrix`` (dynamically-consistent metric —
  null space of A is exactly the set of torques causing no task acceleration)
  else W = I. At the optimum A x = b means the end-effector *feels* F.
- Joint impedance: A = I, b = B (K e - D qd) when ``use_inertia_matrix``
  (uniform closed-loop joint dynamics qdd = K e - D qd) else K e - D qd.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import kinematics, spatial
from qppvm_tpu.opt import linalg
from qppvm_tpu.tasks.base import BOX, AssembleCtx, Constraint, Task


class CartesianImpedanceCtrl(Task):
    """Cartesian spring-damper in torque space
    (/root/reference/src/QPPVMPlugin.cpp:129-152)."""

    def __init__(self, name: str, distal_link: str, base_link: str = "world",
                 indices: Optional[Sequence[int]] = None,
                 stiffness=None, damping=None, use_inertia_matrix: bool = True,
                 reg: float = 1e-6):
        self.name = name
        self.distal_link = distal_link
        self.base_link = base_link
        self.indices = np.asarray(
            list(indices) if indices is not None else range(6), np.int32)
        self.Kc = jnp.eye(6) * 700.0 if stiffness is None else jnp.asarray(stiffness)
        self.Dc = jnp.eye(6) * 70.0 if damping is None else jnp.asarray(damping)
        self.use_inertia_matrix = use_inertia_matrix
        self.reg = reg

    def set_stiffness_damping(self, Kc, Dc):
        self.Kc = jnp.asarray(Kc)
        self.Dc = jnp.asarray(Dc)
        return self

    def _frame(self, model, data):
        from qppvm_tpu.model.dynamics import frame_data, relative_frame_data
        if self.base_link != "world":
            # relative task expressed in the base-link frame (OpenSoT
            # base_link semantics; the reference passes "world")
            return relative_frame_data(model, data, self.distal_link,
                                       self.base_link)
        return frame_data(model, data, self.distal_link)

    def ref_init(self, model, data, state):
        R, p = self._frame(model, data)[:2]
        # "w": runtime task weight (OpenSoT setWeight analog) — a dynamic
        # value in the refs pytree, schedulable without recompilation.
        return {"R": R, "p": p, "v": jnp.zeros(6, p.dtype),
                "w": jnp.ones((), p.dtype)}

    def spring_damper_force(self, ctx: AssembleCtx):
        """F = Kc e_pose + Dc (v_ref - v) (6,), task frame, linear-first —
        the getSpringForce/getDamperForce observables
        (/root/reference/src/QPPVMPlugin.cpp:292-297)."""
        ref = ctx.refs[self.name]
        R, p, _, v, _ = self._frame(ctx.model, ctx.data)
        e = spatial.pose_error(ref["R"], ref["p"], R, p)
        F_spring = self.Kc.astype(ctx.dtype) @ e
        F_damp = self.Dc.astype(ctx.dtype) @ (ref["v"] - v)
        return F_spring, F_damp

    def assemble(self, ctx: AssembleCtx):
        J = self._frame(ctx.model, ctx.data)[2]
        if ctx.model.floating:
            J = J[:, 6:]                             # actuated columns only
        Js = J[self.indices]                         # (k, nj)
        W = ctx.data.Binv if self.use_inertia_matrix else jnp.eye(
            Js.shape[1], dtype=ctx.dtype)
        JW = Js @ W
        G = JW @ Js.T + self.reg * jnp.eye(len(self.indices), dtype=ctx.dtype)
        # G is k x k SPD (k <= 6); invert via matmul-only Newton-Schulz so
        # this per-tick jitted path carries no LU/triangular solve (the
        # repo-wide no-factorization rule, docs/ARCHITECTURE.md).
        A = linalg.spd_inverse(G) @ JW               # (k, nj) = Jbar^T
        F_spring, F_damp = self.spring_damper_force(ctx)
        F = (F_spring + F_damp)[self.indices]
        w = jnp.asarray(self.weight, ctx.dtype) * jnp.asarray(
            ctx.refs[self.name].get("w", 1.0), ctx.dtype)
        return w * A, w * F


class JointImpedanceCtrl(Task):
    """Joint-space spring-damper torque task
    (/root/reference/src/QPPVMPlugin.cpp:114-118)."""

    def __init__(self, name: str = "joint_impedance", stiffness=None,
                 damping=None, use_inertia_matrix: bool = True):
        self.name = name
        self.K = stiffness  # (nj,) diag or None -> 5.0 (reference :105)
        self.D = damping    # (nj,) diag or None -> 2.0 (reference :106)
        self.use_inertia_matrix = use_inertia_matrix

    def ref_init(self, model, data, state):
        # "w": per-joint runtime weights (OpenSoT setWeight analog).
        return {"q": state.q, "w": jnp.ones_like(state.q)}

    def assemble(self, ctx: AssembleCtx):
        nj = ctx.model.nj
        K = jnp.full((nj,), 5.0, ctx.dtype) if self.K is None else jnp.asarray(self.K, ctx.dtype)
        D = jnp.full((nj,), 2.0, ctx.dtype) if self.D is None else jnp.asarray(self.D, ctx.dtype)
        ref = ctx.refs[self.name]
        qref = ref["q"]
        acc_des = K * (qref - ctx.state.q) - D * ctx.state.qd
        if self.use_inertia_matrix:
            B = ctx.data.B
            if ctx.model.floating:
                B = B[6:, 6:]
            b = B @ acc_des
        else:
            b = acc_des
        A = jnp.eye(nj, dtype=ctx.dtype)
        w = jnp.asarray(self.weight, ctx.dtype) * jnp.asarray(
            ref.get("w", 1.0), ctx.dtype)
        wv = jnp.broadcast_to(w, (nj,))
        return wv[:, None] * A, wv * b


class TorqueLimits(Constraint):
    """Box bound on tau_qp, recomputed per tick as tau_const_limit -/+ h
    (/root/reference/src/QPPVMPlugin.cpp:203-205)."""

    name = "torque_limits"

    def __init__(self, tau_max=None, tau_min=None):
        self.tau_max = tau_max  # None -> model.tau_max
        self.tau_min = tau_min

    def assemble(self, ctx: AssembleCtx):
        tmax = ctx.model.tau_max if self.tau_max is None else jnp.asarray(
            self.tau_max, ctx.dtype)
        tmin = -tmax if self.tau_min is None else jnp.asarray(
            self.tau_min, ctx.dtype)
        h = ctx.data.h
        if ctx.model.floating:
            h = h[6:]
        return BOX, None, tmin - h, tmax - h


class JointLimits(Constraint):
    """Position-limit avoidance as a torque bound
    (/root/reference/src/QPPVMPlugin.cpp:169-171 — present-but-disabled in
    the reference; provided for capability parity). Near the upper limit the
    admissible torque interval shrinks toward a restoring (negative) torque:
    ub = k (q_max - q) - d qd, lb = k (q_min - q) - d qd, clipped so
    lb <= ub.
    """

    name = "joint_limits"

    def __init__(self, gain_k=1000.0, gain_d=50.0, margin: float = 0.0):
        self.k = gain_k
        self.d = gain_d
        self.margin = margin

    def set_gains(self, k, d):
        self.k, self.d = k, d
        return self

    def assemble(self, ctx: AssembleCtx):
        m = ctx.model
        k = jnp.asarray(self.k, ctx.dtype)
        d = jnp.asarray(self.d, ctx.dtype)
        qmax = m.q_max - self.margin
        qmin = m.q_min + self.margin
        ub = k * (qmax - ctx.state.q) - d * ctx.state.qd
        lb = k * (qmin - ctx.state.q) - d * ctx.state.qd
        ub = jnp.maximum(ub, lb + 1e-6)
        return BOX, None, lb, ub
