"""Floating-base state estimation.

Two tiers, mirroring and extending the reference's ``sync_model``
(/root/reference/src/ForceAcc.cpp:256-282):

1. ``sync_model_state`` — the reference's exact data flow: joint state from
   the robot, base position + world linear velocity from shared-memory
   channels (published by the simulator), orientation + body angular
   velocity from the IMU (:265-268), fused into one floating-base state
   (:270-275).
2. ``FloatingBaseEstimator`` — leg odometry for deployments with no
   ground-truth position channel: anchors the world positions of stance
   feet and reconstructs base position/linear velocity from joint
   kinematics + IMU orientation. Pure function over pytrees, jit/vmap-safe,
   contact switching handled by 0/1 gates (static shapes).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from qppvm_tpu.model import dynamics, kinematics
from qppvm_tpu.model.robot import RobotModel, RobotState
from qppvm_tpu.precision import f32_matmuls


def sync_model_state(robot, model: RobotModel,
                     dtype=jnp.float32) -> RobotState:
    """Assemble a floating-base RobotState the way the reference does:
    shared-memory base pos/vel + IMU orientation/angular velocity
    (/root/reference/src/ForceAcc.cpp:256-275). ``robot`` is any backend
    exposing get_motor_position/velocity, get_imu, and shared_memory with
    '/sim/floating_base_{position,velocity}' channels."""
    q = jnp.asarray(robot.get_motor_position(), dtype)
    qd = jnp.asarray(robot.get_motor_velocity(), dtype)
    if not model.floating:
        return RobotState.init(model, q=q, qd=qd, dtype=dtype)
    imu = robot.get_imu()
    R = jnp.asarray(imu.orientation, dtype)
    omega_b = jnp.asarray(imu.angular_velocity, dtype)
    sh = robot.shared_memory
    fb_pos = jnp.asarray(
        sh.get_shared_object("/sim/floating_base_position").get(), dtype)
    fb_vel_w = jnp.asarray(
        sh.get_shared_object("/sim/floating_base_velocity").get(), dtype)
    # world linear velocity -> body coords; base_vel is [w; v] body-frame
    v_b = jnp.einsum("ji,j->i", R, fb_vel_w)
    base_vel = jnp.concatenate([omega_b, v_b])
    return RobotState(q=q, qd=qd, base_rot=R, base_pos=fb_pos,
                      base_vel=base_vel)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EstimatorState:
    """Carried leg-odometry state (serializable -> checkpointable like the
    solver warm start, SURVEY.md §5)."""

    base_pos: jax.Array     # (3,) current world base position estimate
    anchors: jax.Array      # (nc, 3) world positions of stance feet
    active_prev: jax.Array  # (nc,) 0/1 gates at the previous tick


class FloatingBaseEstimator:
    """Leg odometry: stance feet are world-fixed anchors.

    Per tick, given measured (q, qd) and IMU (R, omega_body):
    - base position: p = mean_over_active(anchor_c - R @ r_c) where r_c is
      the base-frame foot position from FK;
    - base linear velocity: least-squares solve of the stance constraint
      0 = J_c u over active feet (3x3 normal equations — matmul-only);
    - contact make events re-anchor that foot at its current world position
      (gate logic, static shapes).
    """

    def __init__(self, model: RobotModel, contact_links: Sequence[str],
                 dtype=jnp.float32, ground_z: Optional[float] = 0.0):
        """``ground_z``: terrain prior — a freshly-made contact re-anchors
        with its z PINNED to this ground height instead of inheriting the
        current (possibly drifted) base estimate. Leg odometry has no
        absolute height reference; without the prior every contact remake
        integrates the accumulated z error (the changing-stance-set drift).
        None disables (unknown terrain)."""
        if not model.floating:
            raise ValueError("FloatingBaseEstimator needs a floating base")
        self.model = model
        self.contact_links = tuple(contact_links)
        self.dtype = dtype
        self.ground_z = ground_z
        self._update = jax.jit(self._update_impl)

    # -- helpers ---------------------------------------------------------
    def _feet_base_frame(self, q, R):
        """Base-frame foot positions r_c and world-Jacobians with the base
        at the origin with orientation R (so world == base-translated)."""
        st = RobotState.init(self.model, q=q, base_rot=R, dtype=self.dtype)
        data = dynamics.compute_model_data(self.model, st)
        r = []
        J = []
        for cl in self.contact_links:
            Rc, pc, Jc, _, _ = dynamics.frame_data(self.model, data, cl)
            r.append(pc)          # == R @ r_base since base_pos = 0
            J.append(Jc[:3])      # linear rows, columns [w_b(3) v_b(3) qd]
        return jnp.stack(r), jnp.stack(J)

    def init(self, state: RobotState,
             active: Optional[jax.Array] = None) -> EstimatorState:
        nc = len(self.contact_links)
        active = (jnp.ones(nc, self.dtype) if active is None
                  else jnp.asarray(active, self.dtype))
        r, _ = self._feet_base_frame(state.q, state.base_rot)
        anchors = state.base_pos[None, :] + r
        return EstimatorState(base_pos=state.base_pos, anchors=anchors,
                              active_prev=active)

    def update(self, est: EstimatorState, q, qd, imu_R, imu_omega,
               active: Optional[jax.Array] = None):
        nc = len(self.contact_links)
        active = (jnp.ones(nc, self.dtype) if active is None
                  else jnp.asarray(active, self.dtype))
        return self._update(est, jnp.asarray(q, self.dtype),
                            jnp.asarray(qd, self.dtype),
                            jnp.asarray(imu_R, self.dtype),
                            jnp.asarray(imu_omega, self.dtype), active)

    @f32_matmuls
    def _update_impl(self, est, q, qd, R, omega_b, active):
        r, J = self._feet_base_frame(q, R)     # (nc,3), (nc,3,nv)
        # Only contacts that were ALREADY in stance vote: a freshly-made
        # contact has no valid anchor yet (it re-anchors below, after the
        # pose vote). Fall back to all active if none persisted.
        persistent = active * est.active_prev
        voters = jnp.where(jnp.sum(persistent) > 0.5, persistent, active)
        w = voters / jnp.maximum(jnp.sum(voters), 1.0)

        # position: each stance anchor votes p = anchor - R r_base
        votes = est.anchors - r                # (nc, 3)
        base_pos = jnp.sum(w[:, None] * votes, axis=0)
        # no active contact: hold previous estimate
        any_active = jnp.sum(active) > 0.5
        base_pos = jnp.where(any_active, base_pos, est.base_pos)

        # linear velocity: stance constraint 0 = J_w w_b + J_v v_b + J_q qd
        # normal equations over active feet (A: (nc*3, 3)) — matmul-only.
        A = J[:, :, 3:6]                                   # (nc, 3, 3)
        b = -(jnp.einsum("cij,j->ci", J[:, :, :3], omega_b)
              + jnp.einsum("cij,j->ci", J[:, :, 6:], qd))  # (nc, 3)
        Aw = A * voters[:, None, None]
        bw = b * voters[:, None]
        AtA = jnp.einsum("cki,ckj->ij", Aw, Aw) + 1e-8 * jnp.eye(3, dtype=q.dtype)
        Atb = jnp.einsum("cki,ck->i", Aw, bw)
        from qppvm_tpu.opt import linalg as _linalg
        v_b = _linalg.spd_inverse_ns(AtA, iters=16, refine=2) @ Atb
        v_b = jnp.where(any_active, v_b, jnp.zeros(3, q.dtype))

        # contact make: re-anchor at the current world position estimate,
        # with the z pinned to the terrain prior when one is configured
        made = (active > 0.5) & (est.active_prev < 0.5)
        new_anchor = base_pos[None, :] + r
        if self.ground_z is not None:
            new_anchor = new_anchor.at[:, 2].set(
                jnp.asarray(self.ground_z, q.dtype))
        anchors = jnp.where(made[:, None], new_anchor, est.anchors)

        state = RobotState(q=q, qd=qd, base_rot=R, base_pos=base_pos,
                           base_vel=jnp.concatenate([omega_b, v_b]))
        return state, EstimatorState(base_pos=base_pos, anchors=anchors,
                                     active_prev=active)
