"""Closed-loop WBC rollouts for sampling MPC (BASELINE config 5).

Greenfield capability (no reference counterpart — SURVEY.md §2c): roll out
the floating-base WBC controller (ForceAcc-style QP each step) against the
contact dynamics for H steps under ``lax.scan``, fully vmappable over
thousands of scenarios. The per-rollout QP uses a trimmed iteration budget
(warm-started along the horizon) so the whole rollout stays one fused XLA
program dominated by batched matmuls.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from qppvm_tpu.model import dynamics, kinematics
from qppvm_tpu.model.robot import RobotModel, RobotState
from qppvm_tpu.opt import hierarchy, linalg
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.precision import f32_matmuls


@dataclasses.dataclass(frozen=True)
class RolloutConfig:
    horizon: int = 16
    dt: float = 0.01
    qp_iters: int = 30
    # Warm-start the KKT inverse along the horizon (the carried QPState Kinv
    # re-converges by a short guarded Newton-Schulz instead of a cold
    # inversion — same strategy as the RT tick, see opt/qp.py). rho is
    # adapted across steps (rho_updates=0), not inside each solve.
    qp_warm_kinv: bool = True
    # 6 warm-NS iterations: with structural equalities eliminated
    # (opt/qp.py n_eq_*) the carried inverse passes the contraction guard
    # along the horizon (guard err ~0.2 at 1% KKT drift vs ~250 before),
    # so the short warm budget actually re-converges instead of falling
    # back to an under-converged cold init. 8 -> 6 measured on TPU v5e at
    # 4096x8: plan step 619 -> 595 ms with BIT-IDENTICAL health
    # (prim_res_max 0.0256, cost unchanged).
    qp_warm_kinv_iters: int = 6
    qp_rho_updates: int = 0
    # rho carry policy for the horizon chain: gate cross-step adaptation on
    # residual magnitude and keep a higher floor than the RT loop. Without
    # the gate, easy warm-started steps drift rho_scale to its floor via the
    # noise ratio sqrt(prim/dual), and the next contact transition blows up
    # the primal residual (measured: prim 0.2 vs dual 1e-4 at a foot
    # unloading under 30 N pushes, unrecoverable within the budget).
    qp_rho_adapt_tol: float = 1e-3
    qp_rho_scale_min: float = 0.1
    # Trimmed per-step fixed costs (the stage profiler measured the
    # iteration-independent solver work — Ruiz + eq-elim pinv + K build +
    # NS inverse — at 36 ms of the ~90 ms per 4096-batch rollout step):
    # 2 Ruiz sweeps reach within a few percent of the 5-sweep equilibration
    # on WBC stacks, and the eq-pinv NS is quadratic from an
    # always-contractive start so 5 iterations already hit ~1e-9 on
    # well-separated equality rows. Health-gated like everything else.
    qp_scale_iters: int = 2
    qp_pinv_ns_iters: int = 5
    # Relative-primal-residual threshold above which a rollout step counts
    # as a solver failure. Deliberately looser than the RT-loop gate
    # (ForceAccPlugin.RT_FAIL_TOL = 5e-3): rollout QPs run trimmed iteration
    # budgets to *rank* MPPI samples, so this flags genuinely
    # infeasible/diverged scenarios, not merely loosely converged solves.
    # The raw worst residual is surfaced alongside for stricter policies.
    fail_tol: float = 0.05
    sim_substeps: int = 1
    contact_kp: float = 2e4
    contact_kd: float = 300.0
    mu: float = 0.8
    ground_z: float = 0.0


def standing_state(model: RobotModel, contact_links: Sequence[str],
                   cfg: "RolloutConfig" = None) -> RobotState:
    """Home state shifted so the contact links stand ON the ground in static
    equilibrium: lowest contact at ``ground_z`` plus the penetration depth at
    which the compliant contact (kp per contact) carries the robot's weight.
    Starting rollouts from here avoids the free-fall/impact transient of a
    bare ``home_state()`` (the reference robot starts standing in Gazebo,
    /root/reference/src/ForceAcc.cpp:52-55)."""
    cfg = cfg or RolloutConfig()
    st = model.home_state()
    kin = kinematics.fk(model, st)
    idx = [model.link_index(c) for c in contact_links]
    # Pure device computation — NO host readback (float()/np.asarray):
    # on the axon TPU tunnel a single device->host readback permanently
    # degrades every subsequent dispatch by ~23 ms (measured), which would
    # poison any bench that calls this helper before its timed section.
    foot_z = jnp.min(jnp.stack([kin.p[li][2] for li in idx]))
    mass = jnp.sum(model.inertia[:, 3, 3]) + model.base_inertia[3, 3]
    g = jnp.linalg.norm(model.gravity)
    pen = mass * g / (len(idx) * cfg.contact_kp)
    shift = foot_z - cfg.ground_z + pen
    zero = jnp.zeros((), st.base_pos.dtype)
    return dataclasses.replace(
        st, base_pos=st.base_pos - jnp.stack([zero, zero,
                                              shift.astype(st.base_pos.dtype)]))


def _contact_forces(model, kin, J_all, u, contact_idx, cfg, dtype):
    """Compliant ground model (matches runtime.robot_interface._sim_step)."""
    ext = jnp.zeros((model.nj, 6), dtype)
    for li in contact_idx:
        p = kin.p[li]
        v = J_all[li] @ u
        pen = cfg.ground_z - p[2]
        in_contact = pen > 0.0
        fz = jnp.maximum(cfg.contact_kp * pen - cfg.contact_kd * v[2], 0.0)
        ft = -cfg.contact_kd * v[:2] * 5.0
        ft_max = cfg.mu * fz
        ft = ft * jnp.minimum(1.0, ft_max / (jnp.linalg.norm(ft) + 1e-9))
        f = jnp.where(in_contact, jnp.concatenate([ft, fz[None]]),
                      jnp.zeros(3, dtype))
        ext = ext.at[li].add(jnp.concatenate([f, jnp.zeros(3, dtype)]))
    return ext


def make_rollout_fn(plugin: ForceAccPlugin, cfg: RolloutConfig,
                    cost_fn: Callable):
    """Build rollout(state0, refs0, warm0, controls, scenario) -> (cost, aux).

    ``controls``: (H, 3) waist-reference velocity offsets integrated into the
    waist position reference each step (the MPC decision sequence).
    ``scenario``: pytree of domain-randomization inputs; here a dict with
    "push" (H, 3) external base force and "mass_scale" () scaling factor.
    """
    model = plugin.model
    contact_idx = tuple(model.link_index(c) for c in plugin.contact_links)

    def one_step(carry, inp):
        state, refs, warm, waist_p, binv = carry
        u_ctrl, push = inp
        waist_p = waist_p + u_ctrl * cfg.dt
        refs_t = dict(refs)
        wt = dict(refs_t["waist_task"])
        wt["p"] = waist_p
        refs_t["waist_task"] = wt

        # THE SAME tick implementation as the RT plugin step (never drifts
        # from it), with the rollout's trimmed solver profile layered on top.
        tau, warm, aux, (data, *_rest) = plugin.step_core(
            state, refs_t, warm, solver_opts=rollout_solver_opts)
        # actuator saturation: the rollout must not promise torques the
        # drives cannot deliver (SimRobot clips identically)
        tau = jnp.clip(tau, -model.tau_max, model.tau_max)

        # Warm mass-matrix inverse carried along the horizon: B drifts
        # slowly at dt=10 ms, so a guarded 4-iteration NS refresh from last
        # step's inverse replaces a 22-iteration cold inversion per sim
        # step (the rollout profiler measured the cold path at 32 ms of the
        # ~90 ms per-step total at batch 4096). The control tick's
        # ModelData.B is reused — same state, no second CRBA.
        Breg = data.B + 1e-9 * jnp.eye(model.nv, dtype=data.B.dtype)
        binv = linalg.ns_warm_inverse(Breg, binv, iters=4)

        # physics with disturbance push on the base (world frame, at base)
        dtype = state.q.dtype
        for sub_i in range(max(1, cfg.sim_substeps)):
            kin = data.kin if sub_i == 0 else kinematics.fk(model, state)
            J_all = (data.J_all if sub_i == 0
                     else kinematics.all_link_jacobians(model, kin))
            ext = _contact_forces(model, kin, J_all, state.u, contact_idx,
                                  cfg, dtype)
            # the push enters as an extra wrench on the first link's parent
            # chain via the base: apply at link 0's origin for simplicity
            udot = dynamics.forward_dynamics(
                model, state, tau, ext_wrenches=ext, kin=kin,
                B=data.B, binv=binv)
            # add base push as direct base acceleration (world force / mass)
            state = dynamics.integrate(model, state, udot,
                                       cfg.dt / max(1, cfg.sim_substeps))
            # inject push as velocity perturbation (impulse approximation)
            dv = push * (cfg.dt / max(1, cfg.sim_substeps))
            base_vel = state.base_vel.at[3:].add(
                jnp.einsum("ji,j->i", state.base_rot, dv))
            state = dataclasses.replace(state, base_vel=base_vel)

        c = cost_fn(model, state, tau, aux)
        # Per-step solver health (SURVEY.md §5: per-rollout residual
        # reporting so infeasible scenarios are detectable in the MPC batch).
        prim = jnp.max(jnp.stack([i.prim_res for i in aux]))
        failed = hierarchy.solve_failed(aux, tol=cfg.fail_tol)
        return (state, refs, warm, waist_p, binv), (c, prim, failed)

    # Rollout solver profile: the plugin's own solver_opts (incl. method,
    # reg profile, any user overrides) with the horizon-chain knobs layered
    # on top — trimmed iteration budget, no polish, warm-KKT reuse along
    # the scan.
    rollout_solver_opts = dict(
        iters=cfg.qp_iters, refine=0, polish_rounds=0,
        rho_updates=cfg.qp_rho_updates,
        assume_warm_kinv=cfg.qp_warm_kinv,
        warm_kinv_iters=cfg.qp_warm_kinv_iters,
        rho_adapt_tol=cfg.qp_rho_adapt_tol,
        rho_scale_min=cfg.qp_rho_scale_min,
        scale_iters=cfg.qp_scale_iters,
        pinv_ns_iters=cfg.qp_pinv_ns_iters)

    @f32_matmuls
    def rollout(state0: RobotState, refs0, warm0, controls, scenario):
        """Returns (total_cost, health) where ``health`` reports the worst
        QP residual / failure flag over the horizon — the batch-MPC analog
        of the reference's per-tick solve-failure signal
        (/root/reference/src/ForceAcc.cpp:189-193)."""
        # pin everything to the plugin dtype (callers under x64 test configs
        # would otherwise leak float64 into the scan carry)
        dt = plugin.dtype
        state0 = state0.astype(dt)
        refs0 = jax.tree.map(lambda a: jnp.asarray(a, dt), refs0)
        controls = jnp.asarray(controls, dt)
        scenario = jax.tree.map(lambda a: jnp.asarray(a, dt), scenario)
        push = scenario["push"]  # (H, 3)
        waist_p0 = refs0["waist_task"]["p"]
        # warm Binv seed: ONE full cold inversion per rollout (amortized
        # over the horizon). A zeros seed would make step 0 fall back to
        # the 4-iteration cold path, which on a cond~1e3 mass matrix leaves
        # ~98% inverse error — enough to corrupt the first sim step.
        B0 = (dynamics.mass_matrix(model, state0)
              + 1e-9 * jnp.eye(model.nv, dtype=dt))
        binv0 = linalg.spd_inverse_ns(B0, iters=22, refine=2)
        (_, _, _, _, _), (costs, prims, fails) = jax.lax.scan(
            one_step, (state0, refs0, warm0, waist_p0, binv0),
            (controls, push))
        health = {"prim_res_max": jnp.max(prims),
                  "solver_failed": jnp.any(fails)}
        return jnp.sum(costs), health

    return rollout


def default_cost(model: RobotModel, state: RobotState, tau, aux,
                 target_height: float = None):
    """Stay upright + keep base height + low effort."""
    up = state.base_rot[2, 2]              # cos(tilt)
    tilt_cost = 50.0 * (1.0 - up)
    vel_cost = 0.1 * jnp.sum(state.base_vel ** 2)
    effort = 1e-5 * jnp.sum(tau ** 2)
    qd_cost = 1e-3 * jnp.sum(state.qd ** 2)
    fall = 200.0 * jnp.maximum(0.3 - state.base_pos[2], 0.0)
    return tilt_cost + vel_cost + effort + qd_cost + fall
