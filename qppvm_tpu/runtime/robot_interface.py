"""Robot hardware-abstraction layer + simulated backend.

Re-designs the XBot::RobotInterface slice the reference uses
(/root/reference/src/QPPVMPlugin.cpp:318-328,344-353;
/root/reference/src/ForceAcc.cpp:238-248): motor-side sense, drive-level PD
(setStiffness/setDamping), reference sync (position/effort), move(). The
simulated backend integrates the full floating/fixed-base dynamics with
ground contact, and exposes IMU (C19) and floating-base channels (C18) like
the Gazebo shared-memory objects (/root/reference/src/ForceAcc.cpp:52-55).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from qppvm_tpu.model import dynamics, kinematics
from qppvm_tpu.model.robot import RobotModel, RobotState


class SharedObject:
    """Typed in-process channel (XBot::SharedObject analog,
    /root/reference/src/ForceAcc.cpp:52-55)."""

    def __init__(self, value=None):
        self._value = value

    def set(self, value):
        self._value = value

    def get(self):
        return self._value


class SharedMemory:
    """Name -> SharedObject registry (handle->getSharedMemory analog)."""

    def __init__(self):
        self._objects: Dict[str, SharedObject] = {}

    def get_shared_object(self, name: str) -> SharedObject:
        if name not in self._objects:
            self._objects[name] = SharedObject()
        return self._objects[name]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ImuReading:
    """XBot::ImuSensor analog (/root/reference/src/ForceAcc.cpp:267-268)."""

    orientation: jax.Array       # (3,3) world-from-base
    angular_velocity: jax.Array  # (3,) body frame
    linear_acceleration: jax.Array  # (3,) body frame (incl. gravity)


def standing_state(model: RobotModel, contact_links,
                   ground_z: float = 0.0) -> RobotState:
    """Home state translated so the lowest contact link rests on the ground
    plane — the sim-world analog of the reference's on-robot starting posture
    (home config + feet on the floor, /root/reference/src/ForceAcc.cpp:45-47)."""
    st = model.home_state()
    kin = kinematics.fk(model, st)
    foot_z = min(float(kin.p[model.link_index(c)][2]) for c in contact_links)
    shift = jnp.asarray([0.0, 0.0, foot_z - ground_z], st.base_pos.dtype)
    return dataclasses.replace(st, base_pos=st.base_pos - shift)


class SimRobot:
    """Simulated robot: drive-level PD + commanded effort, integrated with
    compliant ground contact for floating-base robots.

    Sense/command split mirrors the reference: ``sense()`` then
    ``set_reference(...)``/``move()`` advances physics by one control period.
    """

    def __init__(self, model: RobotModel, state: Optional[RobotState] = None,
                 dt: float = 1e-3, substeps: int = 4,
                 contact_links=(), ground_z: float = 0.0,
                 contact_kp: float = 2e4, contact_kd: float = 300.0,
                 mu: float = 0.8, contact_kt: float = 2e4,
                 contact_offsets=None, dtype=jnp.float32):
        """``contact_offsets``: optional dict link_name -> (K,3) local
        contact points (flat-foot patches); default = the link origin."""
        self.model = model
        self.dt = dt
        self.substeps = substeps
        self.state = state if state is not None else model.home_state()
        self.dtype = dtype
        self.contact_links = tuple(contact_links)
        self._contact_idx = tuple(model.link_index(l) for l in contact_links)
        import numpy as _np
        offs = []
        for l in contact_links:
            if contact_offsets and l in contact_offsets:
                offs.append(tuple(map(tuple, _np.asarray(
                    contact_offsets[l], float).reshape(-1, 3).tolist())))
            else:
                offs.append(((0.0, 0.0, 0.0),))
        self._contact_offsets = tuple(offs)
        self.ground_z = ground_z
        self.contact_kp = contact_kp
        self.contact_kd = contact_kd
        self.mu = mu
        self.contact_kt = contact_kt
        nj = model.nj
        # Drive-level impedance (robot->setStiffness/setDamping,
        # /root/reference/src/QPPVMPlugin.cpp:267-268).
        self.k = jnp.zeros(nj, dtype)
        self.d = jnp.zeros(nj, dtype)
        self._q_ref = self.state.q
        self._tau_ref = jnp.zeros(nj, dtype)
        self.shared_memory = SharedMemory()
        self._fb_pos = self.shared_memory.get_shared_object(
            "/sim/floating_base_position")
        self._fb_vel = self.shared_memory.get_shared_object(
            "/sim/floating_base_velocity")
        self._publish_fb()
        # Stiction anchors: one xy anchor per contact point. A tangential
        # spring to the anchor gives the ground STATIC friction (a viscous-only
        # model lets stance feet creep under any sustained shear — the
        # round-2 leg-lift failure mode); the anchor slides only when the
        # spring force saturates the Coulomb limit mu*fz.
        self._anchors = self._init_anchors()
        self._step = jax.jit(partial(_sim_step, model, dt / substeps,
                                     self._contact_idx, self._contact_offsets,
                                     ground_z, contact_kp, contact_kd, mu,
                                     contact_kt))

    def _init_anchors(self) -> jax.Array:
        return init_anchors(self.model, self.state, self._contact_idx,
                            self._contact_offsets, self.dtype)

    # --- sense side -----------------------------------------------------
    def get_motor_position(self) -> jax.Array:
        return self.state.q

    def get_motor_velocity(self) -> jax.Array:
        return self.state.qd

    def get_imu(self) -> ImuReading:
        st = self.state
        g = self.model.gravity
        acc_body = -jnp.einsum("ji,j->i", st.base_rot, g.astype(st.q.dtype))
        return ImuReading(orientation=st.base_rot,
                          angular_velocity=st.base_vel[:3],
                          linear_acceleration=acc_body)

    # --- command side ---------------------------------------------------
    def set_stiffness(self, k):
        self.k = jnp.asarray(k, self.dtype)

    def set_damping(self, d):
        self.d = jnp.asarray(d, self.dtype)

    def set_reference(self, tau_ref=None, q_ref=None):
        """setReferenceFrom(model, Sync::Effort [, Sync::Position])
        (/root/reference/src/QPPVMPlugin.cpp:320, ForceAcc.cpp:242)."""
        if tau_ref is not None:
            self._tau_ref = jnp.asarray(tau_ref, self.dtype)
        if q_ref is not None:
            self._q_ref = jnp.asarray(q_ref, self.dtype)

    def move(self):
        """Advance physics by one control period (robot->move(),
        /root/reference/src/QPPVMPlugin.cpp:328)."""
        for _ in range(self.substeps):
            self.state, self._anchors = self._step(
                self.state, self._anchors, self._tau_ref, self._q_ref,
                self.k, self.d)
        self._publish_fb()

    def _publish_fb(self):
        if self.model.floating:
            self._fb_pos.set(self.state.base_pos)
            self._fb_vel.set(self.state.base_rot @ self.state.base_vel[3:])


def ground_forces(model: RobotModel, contact_idx, contact_offsets, ground_z,
                  kp_c, kd_c, mu, kt_c, kin, J_all, u, anchors, dtype,
                  kd_t=None):
    """THE ground-contact model: per-point compliant normal + stiction-anchor
    tangential forces, accumulated as full wrenches (force AND moment) at
    each contact link's origin. Both the SimRobot plant (``_sim_step``) and
    the MPC rollout dynamics (mpc/rollout.py) call this one function, so
    planner physics and plant physics cannot drift.

    Each contact link may carry several local contact points (foot patch).
    Tangential model: spring-damper to a per-point xy anchor (STICTION — a
    stance foot under sustained shear holds position instead of creeping),
    clamped to the friction cone mu*fz; when the clamp saturates, the anchor
    slides so the spring stays consistent with the clamped force
    (regularized Coulomb friction). Anchors reset to the contact point while
    the point is airborne.

    ``mu`` may be a traced scalar (rollout friction randomization).
    ``kd_t``: tangential damping coefficient (default ``5 * kd_c``, the
    plant's value). An explicit integrator is only stable when
    ``h * kd_t / m_eff < 2``; callers integrating at a coarse step (the MPC
    rollout, h ~ 10 ms vs the plant's 0.25-0.5 ms) MUST pass an h-scaled
    value or the tangential dynamics chatter at the friction-cone limit
    (measured: rollout QP primal residuals 5e-2 from the jittered states).
    Returns ``(ext (nj, 6), new_anchors (n_pts, 2))``."""
    if kd_t is None:
        kd_t = 5.0 * kd_c
    ext = jnp.zeros((model.nj, 6), dtype)
    anchor_rows = []
    pt = 0
    for li, offsets in zip(contact_idx, contact_offsets):
        p0 = kin.p[li]
        R0 = kin.R[li]
        tw = J_all[li] @ u                          # [v; w] at link origin
        n_pts = len(offsets)
        for off in offsets:
            off = jnp.asarray(off, dtype)
            r = R0 @ off
            p = p0 + r
            v = tw[:3] + jnp.cross(tw[3:], r)       # point velocity
            pen = ground_z - p[2]                   # >0 when penetrating
            in_contact = pen > 0.0
            fz = jnp.maximum((kp_c * pen - kd_c * v[2]) / n_pts, 0.0)
            a = anchors[pt]
            ft = (-kt_c * (p[:2] - a) - kd_t * v[:2]) / n_pts
            ft_max = mu * fz
            ft_norm = jnp.linalg.norm(ft) + 1e-9
            scale = jnp.minimum(1.0, ft_max / ft_norm)
            ft = ft * scale
            # sliding: move the anchor so the (clamped) spring force is
            # exactly what the unclamped law would produce at the new a
            a_slide = p[:2] + (ft * n_pts + kd_t * v[:2]) / kt_c
            a_new = jnp.where(in_contact,
                              jnp.where(scale < 1.0, a_slide, a),
                              p[:2])
            anchor_rows.append(a_new)
            pt += 1
            f = jnp.where(in_contact,
                          jnp.concatenate([ft, fz[None]]),
                          jnp.zeros(3, dtype))
            wrench = jnp.concatenate([f, jnp.cross(r, f)])
            ext = ext.at[li].add(wrench)
    return ext, jnp.stack(anchor_rows)


def init_anchors(model: RobotModel, state: RobotState, contact_idx,
                 contact_offsets, dtype=jnp.float32):
    """Initial stiction-anchor positions: each contact point's world xy at
    ``state``. jit-pure (the MPC rollout seeds its per-rollout anchors with
    this from a traced state)."""
    kin = kinematics.fk(model, state)
    pts = []
    for li, offsets in zip(contact_idx, contact_offsets):
        for off in offsets:
            p = kin.p[li] + kin.R[li] @ jnp.asarray(off, dtype)
            pts.append(p[:2])
    if not pts:
        return jnp.zeros((0, 2), dtype)
    return jnp.stack(pts)


def stop_torques(model: RobotModel, state: RobotState,
                 k_stop: float = 2e3, d_stop: float = 20.0) -> jax.Array:
    """Joint-limit hard-stop torques: stiff damped springs beyond
    [q_min, q_max] (the mechanical stop, NOT the actuator — deliberately
    not clipped by tau_max). Shared by the plant (``_sim_step``) and the
    MPC rollout (which passes h-scaled gains, same reasoning as the
    tangential contact parameters)."""
    below = jnp.maximum(model.q_min.astype(state.q.dtype) - state.q, 0.0)
    above = jnp.maximum(state.q - model.q_max.astype(state.q.dtype), 0.0)
    in_stop = (below > 0.0) | (above > 0.0)
    return k_stop * (below - above) - jnp.where(
        in_stop, d_stop * state.qd, 0.0)


def _sim_step(model: RobotModel, h: float, contact_idx, contact_offsets,
              ground_z, kp_c, kd_c, mu, kt_c, state: RobotState, anchors,
              tau_ref, q_ref, k, d):
    """One physics substep (jitted): drive PD + effort + joint hard stops +
    ground contact (``ground_forces``). Returns ``(new_state, new_anchors)``.

    Hard stops: the model's joint limits act as stiff damped stop torques
    (real joints have mechanical stops; MuJoCo enforces jnt_range the same
    way). Without them a commanded-torque plant silently hyperextends —
    measured on the published humanoid.xml, whose knees (range max -2 deg)
    bent BACKWARD under load until the robot bowed over."""
    tau = tau_ref + k * (q_ref - state.q) - d * state.qd
    tau = jnp.clip(tau, -model.tau_max, model.tau_max)
    tau = tau + stop_torques(model, state)

    ext = None
    new_anchors = anchors
    if contact_idx:
        kin = kinematics.fk(model, state)
        J_all = kinematics.all_link_jacobians(model, kin)
        u = state.u if model.floating else state.qd
        ext, new_anchors = ground_forces(
            model, contact_idx, contact_offsets, ground_z, kp_c, kd_c, mu,
            kt_c, kin, J_all, u, anchors, state.q.dtype)

    udot = dynamics.forward_dynamics(model, state, tau, ext_wrenches=ext)
    return dynamics.integrate(model, state, udot, h), new_anchors
