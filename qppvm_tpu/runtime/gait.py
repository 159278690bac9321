"""Sustained gait: chain single-support cycles into locomotion.

The round-3 contact-switch machinery proved ONE lift/hold/re-plant cycle
(runtime/contact_switch.py); this module chains cycles into an N-stride
static walk — the BASELINE config-4 "contact switching at 1 kHz" executed
as *behavior*. A capability upgrade over the reference, whose contact set
is fixed at init (/root/reference/src/ForceAcc.cpp:58,74-96).

Design: each stride is one ``LegLiftScript`` cycle with a forward
``foothold_offset``. Stride geometry (support centroid, swing start pose)
is re-derived from the ACTUAL robot state at each stride boundary — the
script is open-loop within a stride and closed-loop across strides, so
tracking drift never accumulates. All phase changes are VALUES in the refs
pytree (gates, weights, gains, min-jerk PVA references); one compiled step
function serves the whole walk.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import kinematics
from qppvm_tpu.runtime.contact_switch import LegLiftPhases, LegLiftScript


class GaitScript:
    """N-stride static walk (crawl gait: one swing foot at a time).

    Drive exactly like ``LegLiftScript``, but pass the current state so
    stride boundaries can re-anchor::

        gait = GaitScript(model, plugin, refs, initial_waist,
                          order=("foot_hl", "foot_fl", "foot_hr", "foot_fr"),
                          stride=(0.06, 0.0), n_strides=8)
        for i in range(gait.total):
            tau, warm, aux = plugin.control_loop(
                state, gait.refs_at(i, state), warm)

    ``order``: foot cycling order (hind foot before its ipsilateral front
    foot keeps the CoM inside the advancing support triangle).
    ``stride``: (dx, dy) world foothold displacement per swing.
    """

    def __init__(self, model, plugin, refs, initial_waist, *,
                 order: Sequence[str] = ("foot_hl", "foot_fl",
                                         "foot_hr", "foot_fr"),
                 stride: Tuple[float, float] = (0.06, 0.0),
                 n_strides: int = 4,
                 phases: Optional[LegLiftPhases] = None,
                 shift_mode: str = "centroid",
                 tail: int = 300, **lift_kw):
        self.model = model
        self.plugin = plugin
        self.refs = dict(refs)
        self._waist = np.asarray(initial_waist, np.float64)
        # Nominal lateral offset per foot, captured at gait start. Each
        # swing LANDS at its nominal y instead of perpetuating whatever
        # lateral drift the stance phase accumulated — without this the
        # per-stride re-anchor ratchets cone-limited stance slip inward
        # until the support polygon degenerates to a line (measured: all
        # four feet within 4 cm of y=0 by stride 3, CoM outside the
        # polygon, tip-over). The swing is the only lateral drift-
        # correction channel a legged robot has; use it.
        self._y_nom = {c: float(np.asarray(refs[c + "_cartesian"]["p"])[1])
                       for c in plugin.contact_links}
        self.order = list(order)
        self.stride = (float(stride[0]), float(stride[1]))
        self.n_strides = int(n_strides)
        # Default stride phases: the validated leg-lift schedule with a
        # shorter settle (strides after the first start from a settled
        # single-support recovery, not from cold) and hold=0 (a walking
        # swing goes lift-off -> apex -> target without a pause).
        self.phases = phases or LegLiftPhases(
            settle=100, shift=350, dwell=100, unload=150,
            lift=250, hold=0, lower=250, reload=200)
        self.shift_mode = shift_mode
        self.lift_kw = lift_kw
        self.stride_ticks = self.phases.total
        self.tail = int(tail)
        self.total = self.n_strides * self.stride_ticks + self.tail
        self._script: Optional[LegLiftScript] = None
        self._k = -1

    def swing_foot(self, k: int) -> str:
        return self.order[k % len(self.order)]

    def _start_stride(self, k: int, state) -> None:
        kin = kinematics.fk(self.model, state)
        # Re-anchor each foot reference in x/z at its ACTUAL pose
        # (resetReference semantics, /root/reference/src/ForceAcc.cpp:
        # 157-162: absorbs the previous stride's touchdown error) but PIN
        # the lateral reference at the nominal y: a fully-actual re-anchor
        # ratchets cone-limited stance creep inward (the stance servo never
        # fights drift it has absorbed into its own target) until the
        # support polygon degenerates. With y pinned, stance position tasks
        # continuously push creeping feet back out.
        for c in self.plugin.contact_links:
            key = c + "_cartesian"
            tr = dict(self.refs[key])
            p_act = np.asarray(kin.p[self.model.link_index(c)], np.float64)
            tr["p"] = jnp.asarray(
                [p_act[0], self._y_nom[c], p_act[2]], jnp.float32)
            z6 = jnp.zeros(6, jnp.float32)
            tr["v"] = z6
            tr["a"] = z6
            self.refs[key] = tr
        foot = self.swing_foot(k)
        p0y = float(np.asarray(
            self.refs[foot + "_cartesian"]["p"])[1])
        offset = (self.stride[0],
                  self.stride[1] + (self._y_nom[foot] - p0y))
        self._script = LegLiftScript(
            self.model, self.plugin, self.refs, self._waist,
            foot, state=state, phases=self.phases,
            foothold_offset=offset, shift_mode=self.shift_mode,
            **self.lift_kw)
        self._waist = np.asarray(self._script.w1, np.float64)
        self._k = k

    def refs_at(self, i: int, state) -> Dict:
        """Per-tick refs. ``state``: the CURRENT (estimated) robot state —
        consumed only at stride boundaries to re-derive geometry."""
        k = i // self.stride_ticks
        if k >= self.n_strides:
            # tail: hold the final stride's settled refs (gates all on).
            # Guard: with no completed stride to hold (n_strides == 0, or
            # refs_at first called inside the tail region) fall back to the
            # base refs — already a settled all-gates-on hold (ADVICE r4 #4).
            if self._script is None:
                return self.refs
            return self._script.refs_at(self.stride_ticks - 1)
        if k != self._k:
            self._start_stride(k, state)
        return self._script.refs_at(i - k * self.stride_ticks)
