"""Force-level tasks over contact wrench variables.

Re-designs ``tasks::force::CoM`` (/root/reference/src/ForceAcc.cpp:103 —
constructed there but not stacked; part of the capability surface per
SURVEY.md §2b C12): centroidal dynamics rows over the contact forces.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from qppvm_tpu.model import spatial
from qppvm_tpu.opt.variables import AffineExpr
from qppvm_tpu.tasks.base import AssembleCtx, Task


class CoM(Task):
    """Centroidal task: choose contact forces realizing a desired CoM
    acceleration (and zero angular-momentum rate):

        sum_i f_i                      = m (a_com_des - g)
        sum_i (p_i - com) x f_i        = dL_des (= 0)

    ``wrenches`` are 3-vector point forces (world frame) at the contact link
    origins, matching the reference's 3-per-foot variables
    (/root/reference/src/ForceAcc.cpp:67).
    """

    def __init__(self, name: str, wrenches: Sequence[AffineExpr],
                 contact_links: Sequence[str], kp: float = 25.0,
                 kd: Optional[float] = None, angular: bool = True):
        self.name = name
        self.wrenches = list(wrenches)
        self.contact_links = list(contact_links)
        self.kp = kp
        self.kd = 10.0 if kd is None else kd
        self.angular = angular

    def ref_init(self, model, data, state):
        z3 = jnp.zeros(3, data.com_pos.dtype)
        return {"p": data.com_pos, "v": z3, "a": z3}

    def assemble(self, ctx: AssembleCtx):
        m = ctx.data.total_mass
        com = ctx.data.com_pos
        ref = ctx.refs[self.name]
        # full PD: the D term acts on the MEASURED CoM velocity error
        # (mass-weighted average of per-link COM-point velocities), not on
        # the reference velocity alone.
        from qppvm_tpu.model import kinematics as _k
        v_com = _k.com_velocity(ctx.model, ctx.data.kin, ctx.state,
                                ctx.data.vel_all)
        a_des = (ref["a"] + self.kp * (ref["p"] - com)
                 + self.kd * (ref["v"] - v_com))
        g = ctx.model.gravity.astype(ctx.dtype)

        lin_M = 0.0
        lin_c = 0.0
        ang_M = 0.0
        ang_c = 0.0
        from qppvm_tpu.model import kinematics as _kin
        for link, wr in zip(self.contact_links, self.wrenches):
            p_i = _kin.link_pose(ctx.model, ctx.data.kin, link)[1]
            lin_M = lin_M + wr.M[:3]
            lin_c = lin_c + wr.c[:3]
            S = spatial.skew(p_i - com)
            ang_M = ang_M + S @ wr.M[:3]
            ang_c = ang_c + S @ wr.c[:3]

        b_lin = m * (a_des - g) - lin_c
        rows = [lin_M]
        rhs = [b_lin]
        if self.angular:
            rows.append(ang_M)
            rhs.append(-ang_c)
        w = jnp.asarray(self.weight, ctx.dtype)
        return w * jnp.concatenate(rows, axis=0), w * jnp.concatenate(rhs)
