"""Contact-switch (single-support) reference scheduler.

The static-walk primitive on top of the gated wrench constraints
(tasks/generic.py gate semantics): weight shift over the remaining support
polygon -> gate-ramped unload -> swing lift -> hold -> lower -> gate-ramped
reload. A capability upgrade over the reference, whose contact set is fixed
at init (/root/reference/src/ForceAcc.cpp:58,74-96); BASELINE config 4
"contact switching at 1 kHz".

Everything is expressed through the refs pytree of a ForceAccPlugin stack
(pose/vel/acc feedforward, runtime task weights ``w``, runtime servo gains
``kp``/``kd``, postural per-joint weights, contact gates), so one compiled
step function serves the whole maneuver — phases change VALUES, never
shapes.

Tuning notes (measured on the zoo quadruped, tools/exp_leg_lift3.py):
- the gate ramp must fully unload the foot BEFORE the lift starts
  (a binary gate flip is a force discontinuity the warm-started RT solver
  answers with a failed tick);
- min-jerk with velocity AND acceleration feedforward is what lets a
  300 ms swing track with moderate servo gains;
- the swing foot task needs higher kp and weight than stance feet, and the
  swing leg's postural rows must be deweighted or the postural task drags
  the leg back to home.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import kinematics
from qppvm_tpu.runtime.trajectory import min_jerk_pva


@dataclasses.dataclass
class LegLiftPhases:
    """Phase durations in ticks."""

    settle: int = 150
    shift: int = 400
    dwell: int = 150
    unload: int = 150
    lift: int = 250
    hold: int = 250
    lower: int = 250
    reload: int = 250

    @property
    def total(self) -> int:
        return (self.settle + self.shift + self.dwell + self.unload +
                self.lift + self.hold + self.lower + self.reload)


def chain_joints(model, link_name: str) -> list:
    """Actuated joint indices on the kinematic chain from the base to
    ``link_name`` (the swing leg, for postural deweighting)."""
    li = model.link_index(link_name)
    out = []
    parent = np.asarray(model.parent)
    while li >= 0:
        out.append(int(li))
        li = int(parent[li])
    return sorted(out)


class LegLiftScript:
    """Per-tick refs for one swing of ``foot`` while the other contacts
    stay planted. Drive with::

        script = LegLiftScript(model, plugin, refs, initial_waist, "foot_fl")
        for i in range(script.total):
            tau, warm, aux = plugin.control_loop(robot.state,
                                                 script.refs_at(i), warm)
    """

    def __init__(self, model, plugin, refs, initial_waist, foot: str, *,
                 state=None, phases: Optional[LegLiftPhases] = None,
                 margin: float = 0.08, lift_height: float = 0.05,
                 touch_depth: float = 0.005, swing_kp: float = 150.0,
                 swing_w: float = 4.0, postural_deweight: float = 0.05,
                 stance_kp: float = None, stance_w: float = None,
                 dt: float = 1e-3, foothold_offset=(0.0, 0.0),
                 shift_mode: str = "edge"):
        """``foothold_offset``: (dx, dy) world displacement of the re-plant
        target relative to the lift-off point — a stride. The swing goes
        lift-off -> apex (half the offset, at lift_height) -> target, so
        one script instance is one stride of a static walk (runtime/gait.py
        chains them). (0, 0) reproduces the lift-and-replant-in-place cycle.
        ``shift_mode``: "edge" = margin inside the support polygon normal to
        the separating edge (the round-3 leg-lift recipe); "centroid" =
        shift the CoM to the support centroid (robust default for gait,
        where the polygon advances every stride)."""
        self.model = model
        self.plugin = plugin
        self.refs = refs
        self.foot = foot
        self.ph = phases or LegLiftPhases()
        self.dt = dt
        self.swing_kp = swing_kp
        self.swing_kd = 2.0 * float(np.sqrt(swing_kp))
        self.swing_w = swing_w
        # Stance-feet gain/weight boost: the feet tasks are built at
        # postural_kp (25) — enough for a settled stand, but measured on
        # the biped gait a LIGHTLY-LOADED stance foot (fz < ~100 N during
        # the transfer, cone grip ~mu*fz) gets dragged decimeters by the
        # rest of the stack at kp 25. Pinning stance feet at a higher
        # kp/weight makes the foot tasks win that trade.
        self.stance_kp = stance_kp
        self.stance_w = stance_w
        contacts = list(plugin.contact_links)
        self.foot_i = contacts.index(foot)
        self.support = [c for c in contacts if c != foot]
        self.key = foot + "_cartesian"

        # geometry at the start state
        if state is None:
            raise ValueError("pass the start RobotState (for FK geometry)")
        kin0 = kinematics.fk(model, state)
        sup_xy = np.stack([np.asarray(kin0.p[model.link_index(c)])[:2]
                           for c in self.support])
        com0 = np.asarray(kinematics.com(model, kin0)[1])[:2]
        waist0 = np.asarray(initial_waist, np.float64)
        if shift_mode == "centroid":
            shift = sup_xy.mean(axis=0) - com0
        elif len(self.support) >= 3:
            # shift the CoM ``margin`` inside the support polygon, normal to
            # the edge separating the swing corner from the polygon; among
            # candidate separating edges take the LONGEST one (the polygon
            # diagonal facing the swing corner), and fall back to the
            # centroid shift when no edge separates (collinear/degenerate
            # support geometry leaves ``best`` unset).
            others = [i for i in range(len(sup_xy))]
            best = None
            best_len = -1.0
            p_foot = np.asarray(kin0.p[model.link_index(foot)])[:2]
            for a in range(len(sup_xy)):
                for b in range(a + 1, len(sup_xy)):
                    inside = [i for i in others if i not in (a, b)]
                    d = sup_xy[b] - sup_xy[a]
                    n = np.array([d[1], -d[0]])
                    n /= max(np.linalg.norm(n), 1e-9)
                    ref_pt = sup_xy[inside[0]]
                    if np.dot(ref_pt - sup_xy[a], n) < 0:
                        n = -n
                    # the separating edge is one where the swing foot is
                    # on the negative side
                    edge_len = float(np.linalg.norm(d))
                    if (np.dot(p_foot - sup_xy[a], n) < 0
                            and edge_len > best_len):
                        best = (a, b, n)
                        best_len = edge_len
            if best is not None:
                a, b, n = best
                dist = np.dot(com0 - sup_xy[a], n)
                shift = (margin - dist) * n
            else:
                shift = sup_xy.mean(axis=0) - com0
        else:
            shift = sup_xy.mean(axis=0) - com0
        self.w0 = jnp.asarray(waist0, jnp.float32)
        self.w1 = jnp.asarray(waist0 + np.r_[shift, 0.0], jnp.float32)
        # CoM-task channel (plugins built with use_com_task=True expose a
        # "COM" ref): drive the MEASURED CoM through the same min-jerk
        # transfer, closing the loop on the quantity that decides balance.
        # The waist task alone is an open-loop CoM proxy: its soft-weighted
        # tradeoff against postural/feet rows leaves a steady ~50% ramp
        # lag, so the CoM arrives at single support still carrying
        # transfer velocity, the ICP leaves the 5 cm foot patch, the CoP
        # saturates and the stance foot skids sideways (measured on the
        # biped step-in-place: CoM drifts ~0.19 m/s through the whole
        # single-support window with |mx|=|my| pinned at the moment box
        # while upright stays 1.00 — a slow skid, not a topple, that
        # leaves stride 2 with the CoM outside the support polygon).
        # on_start puts a "COM" ref entry in every refs pytree, so gate on
        # the task actually being IN the stack, not on the key existing
        self.has_com = bool(getattr(plugin, "use_com_task", False)) \
            and "COM" in refs
        # The script's intended CoM trajectory (the measured CoM at script
        # start, min-jerked by the same ``shift`` distance the waist
        # moves). Always computed: the CoM-task channel tracks it when the
        # plugin stacks that task, and GaitScript's com_servo reads it as
        # the reference for the waist-target correction.
        com3 = np.asarray(kinematics.com(model, kin0)[1], np.float64)
        self.c0 = jnp.asarray(com3, jnp.float32)
        self.c1 = jnp.asarray(com3 + np.r_[shift, 0.0], jnp.float32)

        p0 = np.asarray(refs[self.key]["p"], np.float64)
        dx, dy = float(foothold_offset[0]), float(foothold_offset[1])
        self.pf0 = jnp.asarray(p0, jnp.float32)
        self.pf_up = jnp.asarray(
            p0 + [0.5 * dx, 0.5 * dy, lift_height], jnp.float32)
        self.pf_dn = jnp.asarray(p0 + [dx, dy, -touch_depth], jnp.float32)
        self.swing_joints = [j for j in chain_joints(model, foot)
                             if j < model.nj]
        self.postural_deweight = postural_deweight
        nc = len(contacts)
        self._gate_on = jnp.ones(nc, jnp.float32)

        p = self.ph
        self.t_shift0 = p.settle
        self.t_dwell0 = self.t_shift0 + p.shift
        self.t_unload0 = self.t_dwell0 + p.dwell
        self.t_lift0 = self.t_unload0 + p.unload
        self.t_hold0 = self.t_lift0 + p.lift
        self.t_lower0 = self.t_hold0 + p.hold
        self.t_reload0 = self.t_lower0 + p.lower
        self.total = p.total

    # -- helpers ---------------------------------------------------------
    def com_ref_at(self, i: int):
        """The script's intended CoM (position, velocity) at tick ``i`` —
        the same min-jerk clock the waist follows. Read by GaitScript's
        com_servo to turn measured CoM error (and error RATE — the phase
        lead that brakes the transfer before it overshoots) into a
        waist-target correction."""
        t_shift = float(np.clip((i - self.t_shift0) * self.dt, 0.0,
                                self.ph.shift * self.dt))
        p, v, _ = min_jerk_pva(self.c0, self.c1, t_shift,
                               self.ph.shift * self.dt)
        return p, v

    def _gate(self, g: float):
        return self._gate_on.at[self.foot_i].set(jnp.float32(g))

    def _set_cart(self, r, key, p, v, a, w=None, kp=None, kd=None):
        tr = dict(r[key])
        tr["p"] = p
        tr["v"] = jnp.zeros(6, jnp.float32).at[:3].set(v)
        tr["a"] = jnp.zeros(6, jnp.float32).at[:3].set(a)
        if w is not None:
            tr["w"] = jnp.asarray(w, jnp.float32)
        if kp is not None:
            tr["kp"] = jnp.asarray(kp, jnp.float32)
            tr["kd"] = jnp.asarray(kd, jnp.float32)
        r[key] = tr
        return r

    def _swing_refs(self, r, p, v, a):
        r = self._set_cart(r, self.key, p, v, a, w=self.swing_w,
                           kp=self.swing_kp, kd=self.swing_kd)
        po = dict(r["POSTURAL"])
        wv = np.ones(self.model.nj, np.float32)
        wv[self.swing_joints] = self.postural_deweight
        po["w"] = jnp.asarray(wv)
        r["POSTURAL"] = po
        return r

    # -- the schedule ----------------------------------------------------
    def refs_at(self, i: int) -> Dict:
        ph, dt = self.ph, self.dt
        r = dict(self.refs)
        if self.stance_kp is not None or self.stance_w is not None:
            # boost EVERY foot's ground-hold gains, not just the support
            # set: the swing foot spends settle/shift/dwell/unload (and
            # any unload-gate pause) planted-but-nearly-unloaded, and at
            # the default kp 25 with ~zero cone grip it gets flung
            # decimeters (measured: the flail window is exactly the gate
            # pause). The lift/hold/lower branches below override the
            # active swing foot with the swing gains.
            for c in (self.support + [self.foot]):
                tr = dict(r[c + "_cartesian"])
                if self.stance_kp is not None:
                    tr["kp"] = jnp.asarray(self.stance_kp, jnp.float32)
                    tr["kd"] = jnp.asarray(
                        2.0 * float(np.sqrt(self.stance_kp)), jnp.float32)
                if self.stance_w is not None:
                    tr["w"] = jnp.asarray(self.stance_w, jnp.float32)
                r[c + "_cartesian"] = tr
        t_shift = float(np.clip((i - self.t_shift0) * dt, 0.0,
                               ph.shift * dt))
        wp, wv, wa = min_jerk_pva(self.w0, self.w1, t_shift, ph.shift * dt)
        r = self._set_cart(r, "waist_task", wp, wv, wa)
        if self.has_com:
            cp, cv, ca = min_jerk_pva(self.c0, self.c1, t_shift,
                                      ph.shift * dt)
            cr = dict(r["COM"])
            cr["p"], cr["v"], cr["a"] = cp, cv, ca
            r["COM"] = cr
        gate = self._gate_on
        z3 = jnp.zeros(3, jnp.float32)
        if self.t_unload0 <= i < self.t_lift0:
            g = float(1.0 - (i - self.t_unload0) / max(ph.unload, 1))
            gate = self._gate(g)
        elif self.t_lift0 <= i < self.t_hold0:
            gate = self._gate(0.0)
            t = float((i - self.t_lift0) * dt)
            p, v, a = min_jerk_pva(self.pf0, self.pf_up, t, ph.lift * dt)
            r = self._swing_refs(r, p, v, a)
        elif self.t_hold0 <= i < self.t_lower0:
            gate = self._gate(0.0)
            r = self._swing_refs(r, self.pf_up, z3, z3)
        elif self.t_lower0 <= i < self.t_reload0:
            gate = self._gate(0.0)
            t = float((i - self.t_lower0) * dt)
            p, v, a = min_jerk_pva(self.pf_up, self.pf_dn, t, ph.lower * dt)
            r = self._swing_refs(r, p, v, a)
        elif i >= self.t_reload0:
            g = float(np.clip((i - self.t_reload0) / max(ph.reload, 1),
                             0.0, 1.0))
            gate = self._gate(g)
            r = self._swing_refs(r, self.pf_dn, z3, z3)
        r["contacts"] = {"active": gate}
        return r
