"""Generic constraints over affine expressions + dynamics feasibility +
friction cones.

Re-designs ``constraints::GenericConstraint``
(/root/reference/src/ForceAcc.cpp:74-96: per-foot wrench box with unilateral
f_z >= 10 N) and ``constraints::acceleration::DynamicFeasibility``
(:109-114,203), and adds the linearized friction cone demanded by the
BASELINE.json north star (no counterpart in the reference).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from qppvm_tpu.opt.variables import AffineExpr
from qppvm_tpu.tasks.base import ROWS, AssembleCtx, Constraint


class GenericConstraint(Constraint):
    """lb <= expr(x) <= ub for an affine expression
    (/root/reference/src/ForceAcc.cpp:91-95).

    ``gate``: optional (refs_key, index) — a 0/1 signal in the refs pytree
    that switches the constraint between its normal bounds (1) and the
    equality expr(x) = 0 (0). This is the contact-switching mechanism
    (BASELINE config 4): deactivating a contact forces its wrench to zero
    with static shapes, inside the same compiled program."""

    def __init__(self, name: str, expr: AffineExpr, ub, lb, gate=None):
        self.name = name
        self.expr = expr
        self.ub = jnp.asarray(ub)
        self.lb = jnp.asarray(lb)
        self.gate = gate

    def assemble(self, ctx: AssembleCtx):
        lb = self.lb.astype(ctx.dtype)
        ub = self.ub.astype(ctx.dtype)
        if self.gate is not None:
            key, idx = self.gate
            g = ctx.refs[key]["active"][idx].astype(ctx.dtype)
            lb = g * lb
            ub = g * ub
        return (ROWS, self.expr.M, lb - self.expr.c, ub - self.expr.c)


class JointAccLimits(Constraint):
    """Joint position-limit avoidance as acceleration bounds on the
    actuated q̈ rows — the acceleration-stack analog of the reference's
    (commented-out) torque-level ``constraints::torque::JointLimits``
    (/root/reference/src/QPPVMPlugin.cpp:169-171, C8):

        kp (q_min - q) - kd q̇  <=  q̈  <=  kp (q_max - q) - kd q̇

    A viability condition: the commanded acceleration can always brake
    before the mechanical stop. Needed whenever a task pushes a joint
    toward its range edge (measured on the published humanoid.xml: knees
    with range max -2 deg resting AT the stop — without this constraint
    the QP commands into the stop, the plant's hard-stop torque answers
    with a reaction the controller's model lacks, and the systematic
    mismatch slowly topples the robot)."""

    def __init__(self, name: str, qddot: AffineExpr, kp: float = 100.0,
                 kd: Optional[float] = None, margin: float = 0.0):
        self.name = name
        self.qddot = qddot
        self.kp = kp
        self.kd = 2.0 * float(np.sqrt(kp)) if kd is None else kd
        self.margin = margin

    def assemble(self, ctx: AssembleCtx):
        off = 6 if ctx.model.floating else 0
        q = ctx.state.q
        qd = ctx.state.qd
        lo = ctx.model.q_min.astype(ctx.dtype) + self.margin
        hi = ctx.model.q_max.astype(ctx.dtype) - self.margin
        ub = self.kp * (hi - q) - self.kd * qd
        lb = self.kp * (lo - q) - self.kd * qd
        # degenerate ranges (lo > hi after margin) keep lb <= ub
        ub = jnp.maximum(ub, lb + 1e-6)
        M = self.qddot.M[off:]
        c = self.qddot.c[off:]
        return (ROWS, M, lb - c, ub - c)


class DynamicFeasibility(Constraint):
    """Floating-base (underactuated) rows of the equations of motion as an
    equality constraint (/root/reference/src/ForceAcc.cpp:109-114):

        B[:6,:] udot + h[:6] = sum_c (J_c^T f_c)[:6]

    ``wrenches`` are affine views of per-contact forces: 3-vectors (point
    contact, world frame) or 6-vectors (full wrench, linear-first).
    """

    is_equality = True  # eliminated by projection (opt/qp.py n_eq_head)

    def __init__(self, name: str, qddot: AffineExpr,
                 wrenches: Sequence[AffineExpr],
                 contact_links: Sequence[str]):
        self.name = name
        self.qddot = qddot
        self.wrenches = list(wrenches)
        self.contact_links = list(contact_links)

    def _rows(self, ctx: AssembleCtx):
        m = ctx.model
        B6 = ctx.data.B[:6, :]                      # (6, nv)
        C = B6 @ self.qddot.M                       # (6, nx)
        c_off = B6 @ self.qddot.c
        from qppvm_tpu.model.dynamics import frame_data
        for link, wr in zip(self.contact_links, self.wrenches):
            Jc = frame_data(m, ctx.data, link)[2]   # (6, nv) linear-first
            JcT6 = Jc[: wr.size, :6].T              # (6, k) base rows of Jc^T
            C = C - JcT6 @ wr.M
            c_off = c_off - JcT6 @ wr.c
        h6 = ctx.data.h[:6]
        rhs = -h6 - c_off
        return C, rhs

    def assemble(self, ctx: AssembleCtx):
        C, rhs = self._rows(ctx)
        return ROWS, C, rhs, rhs                    # equality: lb == ub

    def check_constraint(self, ctx: AssembleCtx, x):
        """Residual of the equality at a solution
        (/root/reference/src/ForceAcc.cpp:203)."""
        C, rhs = self._rows(ctx)
        return C @ x - rhs


class FrictionCone(Constraint):
    """Linearized (pyramid) friction cone per contact, in world frame with a
    flat ground normal +z:  |f_x| <= mu/sqrt(2) f_z, |f_y| <= mu/sqrt(2) f_z,
    f_min <= f_z <= f_max. North-star capability (SURVEY.md §2b C14
    generalization); not present in the reference."""

    def __init__(self, name: str, force: AffineExpr, mu: float = 0.7,
                 f_min: float = 0.0, f_max: float = 1e4, gate=None):
        self.name = name
        self.force = force  # (3,) affine view [fx, fy, fz]
        self.mu = mu
        self.f_min = f_min
        self.f_max = f_max
        self.gate = gate  # (refs_key, index) contact-switch signal

    def assemble(self, ctx: AssembleCtx):
        mu = self.mu / np.sqrt(2.0)
        F = self.force.M
        c = self.force.c
        fx, fy, fz = F[0], F[1], F[2]
        cx, cy, cz = c[0], c[1], c[2]
        big = jnp.asarray(1e20, ctx.dtype)
        rows = jnp.stack([
            fx - mu * fz,     # <= 0
            -fx - mu * fz,    # <= 0
            fy - mu * fz,     # <= 0
            -fy - mu * fz,    # <= 0
            fz,               # in [f_min, f_max]
        ])
        offs = jnp.stack([cx - mu * cz, -cx - mu * cz, cy - mu * cz,
                          -cy - mu * cz, cz])
        lb = jnp.stack(
            [-big, -big, -big, -big, jnp.asarray(self.f_min, ctx.dtype)]
        ) - offs
        ub = jnp.stack(
            [jnp.zeros((), ctx.dtype)] * 4 + [jnp.asarray(self.f_max, ctx.dtype)]
        ) - offs
        if self.gate is not None:
            key, idx = self.gate
            g = ctx.refs[key]["active"][idx].astype(ctx.dtype)
            # inactive: all rows become the equality f = 0
            lb = g * lb + (1.0 - g) * (-offs)
            ub = g * ub + (1.0 - g) * (-offs)
        return ROWS, rows, lb, ub


class CoPBox(Constraint):
    """fz-proportional center-of-pressure / torsion box on a full 6D
    contact wrench (flat ground, +z normal; moments about the link origin
    in world frame). With CoP coordinates px = -my/fz, py = mx/fz:

        x_min*fz <= -my <= x_max*fz      (px inside the sole patch)
        -y_half*fz <= mx <= y_half*fz    (py inside the sole patch)
        -t_coef*fz <= mz <= t_coef*fz    (torsion ~ torsional friction)

    Linear in the wrench, same pyramid pattern as FrictionCone. REPLACES
    a static moment box for flat feet: a constant +/-30 Nm box is
    simultaneously too TIGHT at high load (it caps the CoP at 3.3 cm on a
    5 cm sole under 900 N, binding before the physical patch edge exactly
    when single-support balance needs the full sole) and fictitious at
    low load (at 50 N it admits a CoP 60 cm outside the foot — commanded
    moments the ground cannot produce, a measured instability source
    during gait unloads). Gate semantics match FrictionCone: an inactive
    contact's rows become equalities at 0.

    North-star capability (SURVEY.md §2b C14 generalization); the
    reference's analog is its +/-1 Nm static wrench box
    (/root/reference/src/ForceAcc.cpp:74-76).
    """

    def __init__(self, name: str, wrench: AffineExpr,
                 x_min: float = -0.05, x_max: float = 0.05,
                 y_half: float = 0.05, t_coef: float = 0.01, gate=None):
        assert wrench.size == 6, "CoPBox needs a full 6D wrench view"
        self.name = name
        self.wrench = wrench
        self.x_min = float(x_min)
        self.x_max = float(x_max)
        self.y_half = float(y_half)
        self.t_coef = float(t_coef)
        self.gate = gate

    def assemble(self, ctx: AssembleCtx):
        W = self.wrench.M
        c = self.wrench.c
        fz, mx, my, mz = W[2], W[3], W[4], W[5]
        cz, cmx, cmy, cmz = c[2], c[3], c[4], c[5]
        rows = jnp.stack([
            mx - self.y_half * fz,        # py <= y_half
            -mx - self.y_half * fz,       # py >= -y_half
            -my - self.x_max * fz,        # px <= x_max
            my + self.x_min * fz,         # px >= x_min
            mz - self.t_coef * fz,
            -mz - self.t_coef * fz,
        ])
        offs = jnp.stack([
            cmx - self.y_half * cz, -cmx - self.y_half * cz,
            -cmy - self.x_max * cz, cmy + self.x_min * cz,
            cmz - self.t_coef * cz, -cmz - self.t_coef * cz,
        ])
        big = jnp.asarray(1e20, ctx.dtype)
        lb = jnp.full((6,), -big, ctx.dtype) - offs
        ub = jnp.zeros((6,), ctx.dtype) - offs
        if self.gate is not None:
            key, idx = self.gate
            g = ctx.refs[key]["active"][idx].astype(ctx.dtype)
            lb = g * lb + (1.0 - g) * (-offs)
            ub = g * ub + (1.0 - g) * (-offs)
        return ROWS, rows, lb, ub
