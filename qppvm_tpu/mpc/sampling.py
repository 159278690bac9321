"""Sampling MPC (MPPI) over batched WBC rollouts, sharded over a device mesh.

BASELINE config 5: "4096 domain-randomized contact/disturbance rollouts
batched per step, sharded across a multi-host pod slice". Greenfield (the
reference is single-robot single-thread; SURVEY.md §2c).

TPU mapping:
- rollouts  -> leading batch axis, vmap + NamedSharding over mesh axis
  "rollout" (DP). Each rollout's QP chain stays on one chip (design decision
  recorded in SURVEY §2c: no TP at 30-60-wide matrices).
- horizon   -> lax.scan inside each rollout (sequential by physics).
- reduction -> MPPI softmax weights: global min/logsumexp over the batch;
  under jit+GSPMD these lower to psum/all-reduce collectives riding ICI.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qppvm_tpu.mpc.rollout import RolloutConfig, default_cost, make_rollout_fn
from qppvm_tpu.plugins.force_acc import ForceAccPlugin


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    n_samples: int = 256
    horizon: int = 16
    lambda_: float = 1.0
    noise_std: float = 0.15
    push_std: float = 0.0     # domain randomization: random base pushes (N)
    nu: int = 3               # control dim (waist ref velocity)
    # Additive cost for rollouts whose QP chain failed (large residual /
    # non-finite objective): they stay detectable in ``info`` but never
    # dominate the MPPI average — the batch analog of the reference's
    # skip-actuation-on-failure (/root/reference/src/ForceAcc.cpp:189-193).
    fail_penalty: float = 1e6


class SamplingMPC:
    """MPPI controller: perturb the nominal waist-velocity plan, roll out the
    full WBC-in-the-loop dynamics per sample, exponentially average."""

    def __init__(self, plugin: ForceAccPlugin, mppi: MPPIConfig,
                 rollout_cfg: Optional[RolloutConfig] = None,
                 mesh: Optional[Mesh] = None, cost_fn=default_cost):
        self.plugin = plugin
        self.mppi = mppi
        self.rcfg = rollout_cfg or RolloutConfig(horizon=mppi.horizon)
        self.mesh = mesh
        self.rollout = make_rollout_fn(plugin, self.rcfg, cost_fn)
        self._step = jax.jit(self._step_impl)

    def init_plan(self, dtype=jnp.float32):
        return jnp.zeros((self.mppi.horizon, self.mppi.nu), dtype)

    def _step_impl(self, key, state, refs, warm, U_nom):
        m = self.mppi
        K = m.n_samples
        k_noise, k_push = jax.random.split(key)
        noise = m.noise_std * jax.random.normal(
            k_noise, (K, m.horizon, m.nu), U_nom.dtype)
        U = U_nom[None] + noise                           # (K, H, nu)
        push = m.push_std * jax.random.normal(
            k_push, (K, m.horizon, 3), U_nom.dtype)

        if self.mesh is not None:
            spec = NamedSharding(self.mesh, P("rollout"))
            U = jax.lax.with_sharding_constraint(U, spec)
            push = jax.lax.with_sharding_constraint(push, spec)

        def one(Uk, pushk):
            return self.rollout(state, refs, warm, Uk, {"push": pushk})

        costs, health = jax.vmap(one)(U, push)            # (K,), dict of (K,)
        failed = health["solver_failed"]
        costs = jnp.where(jnp.isfinite(costs), costs, m.fail_penalty)
        costs = costs + m.fail_penalty * failed.astype(costs.dtype)
        beta = jnp.min(costs)                             # all-reduce min
        w = jnp.exp(-(costs - beta) / m.lambda_)
        w = w / jnp.sum(w)                                # all-reduce sum
        U_new = jnp.einsum("k,khu->hu", w, U)
        info = {
            "cost_min": beta,
            "cost_mean": jnp.mean(costs),
            "ess": 1.0 / jnp.sum(w ** 2),                 # effective samples
            # per-batch solver health (SURVEY.md §5): infeasible scenarios
            # are detectable, not silently averaged in
            "solver_fail_frac": jnp.mean(failed.astype(costs.dtype)),
            "prim_res_max": jnp.max(health["prim_res_max"]),
        }
        return U_new, info

    def plan(self, key, state, refs, warm, U_nom):
        """One MPC re-planning step. Returns (U_new, info). The first row of
        U_new is the control applied this tick; shift for the next tick."""
        return self._step(key, state, refs, warm, U_nom)

    @staticmethod
    def shift_plan(U):
        return jnp.concatenate([U[1:], U[-1:]], axis=0)
