"""Config-5 widening (VERDICT r2 missing #2 / next #5): domain-randomized
contact/disturbance rollouts and the footstep-recovery decision channel.

- scenario randomization beyond pushes: per-rollout TRUE-model mass scale
  (the controller keeps the nominal model), ground-friction scale, and
  contact-gate sequences INSIDE the horizon;
- the swing-primitive decision (rollout.make_swing_primitive) lets the
  sampling planner choose to STEP: from a laterally-shoved state it
  concentrates swing activation on the unloaded (push-side-opposite) feet
  and moves the foothold in the push direction — textbook capture-step
  structure, discovered by MPPI, not scripted.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import zoo
from qppvm_tpu.mpc.rollout import RolloutConfig
from qppvm_tpu.mpc.sampling import MPPIConfig, SamplingMPC
from qppvm_tpu.plugins.force_acc import ForceAccPlugin
from qppvm_tpu.runtime.robot_interface import standing_state

CONTACTS = ("foot_fl", "foot_fr", "foot_hr", "foot_hl")


def _quadruped_mpc(mppi, rcfg):
    model = zoo.quadruped()
    plugin = ForceAccPlugin(model, contact_links=CONTACTS,
                            waist_link="pelvis", iters=40,
                            switchable_contacts=True,
                            use_friction_cones=True, mu=0.5,
                            foot_tasks_6d=False)
    st = standing_state(model, CONTACTS)
    refs, warm, _ = plugin.on_start(st)
    return plugin, st, refs, warm, SamplingMPC(plugin, mppi, rcfg)


def test_scenario_randomization_healthy():
    """Mass x friction x push randomization: every rollout's QP chain stays
    healthy and the MPPI reduction is non-degenerate."""
    mppi = MPPIConfig(n_samples=24, horizon=6, push_std=25.0,
                      mass_scale_std=0.12, mu_scale_range=0.35)
    rcfg = RolloutConfig(horizon=6, qp_iters=15, dt=0.02, sim_substeps=2)
    plugin, st, refs, warm, mpc = _quadruped_mpc(mppi, rcfg)
    U, info = mpc.plan(jax.random.PRNGKey(0), st, refs, warm,
                       mpc.init_plan())
    assert float(info["solver_fail_frac"]) == 0.0, info
    assert np.isfinite(float(info["cost_mean"]))
    assert float(info["ess"]) > 1.5, float(info["ess"])


def test_gate_sequence_inside_horizon():
    """Contact switching INSIDE a rollout horizon: a gate_seq that ramps one
    foot off mid-horizon keeps the whole chain healthy (the gate machinery
    is exercised in the rollout dynamics, not just single ticks)."""
    mppi = MPPIConfig(n_samples=4, horizon=8)
    rcfg = RolloutConfig(horizon=8, qp_iters=20, dt=0.02, sim_substeps=2)
    plugin, st, refs, warm, mpc = _quadruped_mpc(mppi, rcfg)
    H = 8
    ramp = jnp.clip(1.0 - jnp.arange(H) / 3.0, 0.0, 1.0)   # foot_fl off
    gate_seq = jnp.ones((H, 4)).at[:, 0].set(ramp)
    controls = jnp.zeros((H, 3))
    cost, health = mpc.rollout(st, refs, warm, controls,
                               {"push": jnp.zeros((H, 3)),
                                "gate_seq": gate_seq})
    assert not bool(health["solver_failed"]), health
    assert np.isfinite(float(cost))


def test_step_recovery_decision_channel():
    """The footstep-recovery channel end-to-end: (a) DETERMINISTIC physics —
    at a 2.5 m/s lateral shove (beyond cone-limited lean-braking), a
    capture-step rollout (swing the unloaded-side foot, land it toward the
    push) costs LESS than the lean-only rollout of the same machinery;
    (b) MPPI plumbing — plan_step samples/averages theta next to the waist
    plan and stays finite with a non-degenerate batch. The closed-loop
    discovery experiments (which feet MPPI picks, how the magnitude evolves)
    live in tools/exp_step_recovery.py — their outcome is seed- and
    solver-numerics-sensitive, so the TEST pins only the deterministic
    claims."""
    from qppvm_tpu.mpc.rollout import (default_cost, make_rollout_fn,
                                       make_swing_primitive)
    mppi = MPPIConfig(n_samples=24, horizon=12, noise_std=0.2,
                      step_recovery=True, theta_noise_std=1.5,
                      dxy_noise_std=0.1)
    rcfg = RolloutConfig(horizon=12, qp_iters=40, dt=0.04, sim_substeps=4,
                         mu=1.3)
    plugin, st, refs, warm, mpc = _quadruped_mpc(mppi, rcfg)
    H = 12
    stp = dataclasses.replace(st, base_vel=st.base_vel.at[4].add(2.5))

    # (a) deterministic: capture-step rollout beats lean-only
    swing, init_theta = make_swing_primitive(plugin)
    rollout = make_rollout_fn(plugin, rcfg, default_cost, swing=swing)
    U0 = jnp.zeros((H, 3))
    scen = {"push": jnp.zeros((H, 3))}
    c_lean, _ = rollout(stp, refs, warm, U0, scen, init_theta())
    theta_step = {"swing": jnp.asarray([-8.0, 3.0, -8.0, -8.0]),  # fr
                  "t0": jnp.asarray(-2.0),
                  "dxy": jnp.asarray([0.0, 0.1])}
    c_step, _ = rollout(stp, refs, warm, U0, scen, theta_step)
    assert float(c_step) < float(c_lean), (float(c_step), float(c_lean))

    # (b) the sampled decision channel stays fully healthy end-to-end (on
    # the nominal standing state; at the 2.5 m/s shove whole batches
    # legitimately blow the rollout fail gate and are penalized)
    U, theta = mpc.init_plan(), mpc.init_theta()
    key = jax.random.PRNGKey(0)
    for _ in range(2):
        key, k = jax.random.split(key)
        (U, theta), info = mpc.plan_step(k, st, refs, warm, U, theta)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in theta.values())
    assert np.isfinite(float(info["cost_min"]))
    # a couple of wildly-sampled exploratory steps may legitimately blow
    # the rollout gate and get penalized; the batch must stay usable
    assert float(info["solver_fail_frac"]) < 0.2, info
