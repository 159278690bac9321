"""Acceleration-level tasks over an Optvar decision variable
(x = [qddot; contact wrenches ...]), as used by the ForceAcc plugin.

Re-designs ``tasks::acceleration::Cartesian``
(/root/reference/src/ForceAcc.cpp:83-89,118-122) and
``tasks::acceleration::Postural`` (:105-107).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import kinematics, spatial
from qppvm_tpu.opt.variables import AffineExpr
from qppvm_tpu.tasks.base import AssembleCtx, Task


class Cartesian(Task):
    """Cartesian acceleration task: J udot + Jdot u = xdd_des with a PD servo
    on the pose reference (setPositionReference / resetReference,
    /root/reference/src/ForceAcc.cpp:157-162,181)."""

    def __init__(self, name: str, distal_link: str, qddot: AffineExpr,
                 base_link: str = "world", kp: float = 100.0,
                 kd: Optional[float] = None,
                 indices: Optional[Sequence[int]] = None):
        self.name = name
        self.base_link = base_link
        self.distal_link = distal_link
        self.qddot = qddot
        self.kp = kp
        self.kd = 2.0 * float(np.sqrt(kp)) if kd is None else kd
        self.indices = np.asarray(
            list(indices) if indices is not None else range(6), np.int32)

    def ref_init(self, model, data, state):
        if self.base_link != "world":
            from qppvm_tpu.model.dynamics import relative_frame_data
            R, p, _, _, _ = relative_frame_data(model, data,
                                                self.distal_link,
                                                self.base_link)
        else:
            R, p = kinematics.link_pose(model, data.kin, self.distal_link)
        z6 = jnp.zeros(6, p.dtype)
        # "w": runtime task weight (OpenSoT setWeight analog) — a dynamic
        # VALUE in the refs pytree so weight schedules (e.g. swing-foot
        # upweighting during contact switching) stay inside one compiled
        # program with static shapes. "kp"/"kd" likewise: runtime servo
        # gains (setLambda analog) so a swing foot can track a fast lift
        # trajectory without a task rebuild.
        return {"R": R, "p": p, "v": z6, "a": z6, "w": jnp.ones((), p.dtype),
                "kp": jnp.asarray(self.kp, p.dtype),
                "kd": jnp.asarray(self.kd, p.dtype)}

    def assemble(self, ctx: AssembleCtx):
        from qppvm_tpu.model.dynamics import frame_data, relative_frame_data
        if self.base_link != "world":
            # relative task: pose/jacobian/bias of distal w.r.t. base link,
            # expressed in the base frame (OpenSoT base_link semantics)
            R, p, J, v, bias = relative_frame_data(
                ctx.model, ctx.data, self.distal_link, self.base_link)
        else:
            R, p, J, v, bias = frame_data(ctx.model, ctx.data,
                                          self.distal_link)
        ref = ctx.refs[self.name]
        e = spatial.pose_error(ref["R"], ref["p"], R, p)
        kp = jnp.asarray(ref.get("kp", self.kp), ctx.dtype)
        kd = jnp.asarray(ref.get("kd", self.kd), ctx.dtype)
        xdd_des = ref["a"] + kp * e + kd * (ref["v"] - v)
        A_full = (J @ self.qddot.M)[self.indices]
        b_full = (xdd_des - bias - J @ self.qddot.c)[self.indices]
        w = jnp.asarray(self.weight, ctx.dtype) * jnp.asarray(
            ref.get("w", 1.0), ctx.dtype)
        return w * A_full, w * b_full


class Postural(Task):
    """Joint-space acceleration task (/root/reference/src/ForceAcc.cpp:105-107).

    Acts on the actuated-joint rows of qddot (skips the 6 floating-base rows
    for floating models)."""

    def __init__(self, name: str, qddot: AffineExpr, kp: float = 25.0,
                 kd: Optional[float] = None):
        self.name = name
        self.qddot = qddot
        self.kp = kp
        self.kd = 2.0 * float(np.sqrt(kp)) if kd is None else kd

    def ref_init(self, model, data, state):
        # "w": per-joint runtime weights (OpenSoT setWeight analog) —
        # deweighting a swing leg's rows during contact switching keeps the
        # postural task from fighting the swing-foot Cartesian task.
        return {"q": state.q, "w": jnp.ones_like(state.q)}

    def assemble(self, ctx: AssembleCtx):
        ref = ctx.refs[self.name]
        qref = ref["q"]
        qdd_des = self.kp * (qref - ctx.state.q) - self.kd * ctx.state.qd
        off = 6 if ctx.model.floating else 0
        A = self.qddot.M[off:]
        b = qdd_des - self.qddot.c[off:]
        w = jnp.asarray(self.weight, ctx.dtype) * jnp.asarray(
            ref.get("w", 1.0), ctx.dtype)
        wv = jnp.broadcast_to(w, b.shape)
        return wv[:, None] * A, wv * b
