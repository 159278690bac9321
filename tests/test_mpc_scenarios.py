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


def test_step_recovery_planner_chooses_capture_step():
    """From a hard +y shove (2 m/s — beyond what cone-limited lean-braking
    can stop inside the support polygon), the theta channel discovers the
    capture-step structure: swing the UNLOADED (-y) side's feet, move the
    foothold toward +y. Health note: many rollouts at this violence are
    legitimately unconvergeable within the trimmed budget; they are
    penalized, surfaced in info, and must not be ALL of the batch."""
    mppi = MPPIConfig(n_samples=48, horizon=12, noise_std=0.2,
                      step_recovery=True, theta_noise_std=1.5,
                      dxy_noise_std=0.1)
    rcfg = RolloutConfig(horizon=12, qp_iters=40, dt=0.04, sim_substeps=4,
                         mu=1.3)
    plugin, st, refs, warm, mpc = _quadruped_mpc(mppi, rcfg)
    st = dataclasses.replace(st, base_vel=st.base_vel.at[4].add(2.0))
    U, theta = mpc.init_plan(), mpc.init_theta()
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, k = jax.random.split(key)
        (U, theta), info = mpc.plan_step(k, st, refs, warm, U, theta)
    a = np.asarray(jax.nn.sigmoid(theta["swing"]))   # (fl, fr, hr, hl)
    right = max(a[1], a[2])      # fr, hr: y = -0.2 (unloaded side)
    left = max(a[0], a[3])       # fl, hl: y = +0.2 (loaded side)
    # structural claims (robust across seeds): the swing choice concentrates
    # on the unloaded side and the foothold moves with the push
    assert right > 0.2, a
    assert right > 2.5 * left, a
    dxy = np.asarray(theta["dxy"])
    assert dxy[1] > 0.02, dxy                        # step toward the push
    assert float(info["solver_fail_frac"]) < 1.0
