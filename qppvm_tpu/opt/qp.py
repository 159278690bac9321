"""Batched dense QP solver — OSQP-style ADMM with fixed iteration count.

Replaces the qpOASES dense active-set backend of the reference
(/root/reference/src/QPPVMPlugin.cpp:21,188,246). Active-set pivoting is
data-dependent control flow — hostile to XLA; instead we use first-order ADMM
whose per-iteration work is *matmul only* (one KKT-inverse apply + one
constraint matvec), so a whole solve is a fixed-shape fused XLA loop that
vmaps across thousands of rollout QPs and feeds the MXU.

    minimize   1/2 x^T P x + q^T x
    subject to l <= A x <= u        (equalities: l == u rows)

Warm starting (the entire point of qpOASES hot-start in the 1 kHz loop) is an
explicit carried ``QPState`` pytree — serializable, checkpointable.

Accuracy backstop: ``refine=k`` applies k steps of iterative refinement on the
final active set (solving the KKT equalities exactly), recovering near-direct
precision when the active set has settled (typical in warm-started RT loops).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QPProblem:
    P: jax.Array  # (n, n) PSD
    q: jax.Array  # (n,)
    A: jax.Array  # (m, n)
    l: jax.Array  # (m,)
    u: jax.Array  # (m,)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QPState:
    """Warm-start state carried across control ticks."""

    x: jax.Array  # (n,)
    z: jax.Array  # (m,)
    y: jax.Array  # (m,)

    @staticmethod
    def zero(n: int, m: int, dtype=jnp.float32) -> "QPState":
        return QPState(x=jnp.zeros(n, dtype), z=jnp.zeros(m, dtype),
                       y=jnp.zeros(m, dtype))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QPInfo:
    """Solver status for the batch — the analog of the reference's
    solve-failure signalling (/root/reference/src/QPPVMPlugin.cpp:246-249)."""

    prim_res: jax.Array  # () inf-norm of Ax - z
    dual_res: jax.Array  # () inf-norm of Px + q + A^T y
    obj: jax.Array       # () objective value


def _rho_vec(l, u, rho):
    """Per-row penalty: boost equality rows (OSQP strategy)."""
    eq = (u - l) < 1e-8
    loose = (u - l) > 1e16
    base = jnp.where(eq, rho * 1e3, rho)
    return jnp.where(loose, rho * 1e-6, base)


def solve(
    problem: QPProblem,
    state: Optional[QPState] = None,
    *,
    iters: int = 80,
    rho: float = 0.1,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    refine: int = 2,
    rho_updates: int = 3,
):
    """One dense QP solve. Returns (x, new_state, info). vmap for batches.

    ``rho_updates`` OSQP-style adaptive-rho rounds: iterations run in chunks;
    after each chunk rho is rescaled by sqrt(prim_res/dual_res) and the KKT
    inverse is rebuilt (a handful of extra small inverses — static shapes, so
    the whole thing remains one XLA program).
    """
    P, q, A, l, u = problem.P, problem.q, problem.A, problem.l, problem.u
    n = P.shape[0]
    m = A.shape[0]
    dtype = P.dtype
    if state is None:
        state = QPState.zero(n, m, dtype)

    rho_base = _rho_vec(l, u, jnp.asarray(rho, dtype))
    n_chunks = max(1, rho_updates + 1)
    chunk = max(1, iters // n_chunks)

    x, z, y = state.x, state.z, state.y
    rho_scale = jnp.asarray(1.0, dtype)
    for _ in range(n_chunks):
        rho_v = rho_base * rho_scale
        K = P + sigma * jnp.eye(n, dtype=dtype) + (A.T * rho_v) @ A
        # Explicit inverse: K is strongly SPD (sigma shift); iterations then
        # are pure matvecs (MXU-friendly under vmap), no triangular solves.
        Kinv = _spd_inverse(K)

        def body(carry, _):
            x, z, y = carry
            rhs = sigma * x - q + A.T @ (rho_v * z - y)
            x_t = Kinv @ rhs
            z_t = A @ x_t
            x_n = alpha * x_t + (1 - alpha) * x
            z_r = alpha * z_t + (1 - alpha) * z
            z_n = jnp.clip(z_r + y / rho_v, l, u)
            y_n = y + rho_v * (z_r - z_n)
            return (x_n, z_n, y_n), None

        (x, z, y), _ = jax.lax.scan(body, (x, z, y), None, length=chunk)

        # OSQP residual-balancing rho update (relative residuals).
        Ax = A @ x
        Px = P @ x
        Aty = A.T @ y
        prim = jnp.max(jnp.abs(Ax - z)) / (
            jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z))) + 1e-10)
        dual = jnp.max(jnp.abs(Px + q + Aty)) / (
            jnp.maximum(jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))),
                        jnp.max(jnp.abs(q))) + 1e-10)
        factor = jnp.sqrt(prim / jnp.maximum(dual, 1e-12))
        factor = jnp.clip(factor, 0.1, 10.0)
        rho_scale = jnp.clip(rho_scale * factor, 1e-4, 1e4)

    if refine > 0:
        for _ in range(2):
            x, y = _polish(P, q, A, l, u, x, y, steps=refine)
        z = jnp.clip(A @ x, l, u)

    prim = jnp.max(jnp.abs(A @ x - z))
    dual = jnp.max(jnp.abs(P @ x + q + A.T @ y))
    obj = 0.5 * x @ P @ x + q @ x
    return x, QPState(x=x, z=z, y=y), QPInfo(prim_res=prim, dual_res=dual,
                                             obj=obj)


def _spd_inverse(K):
    L = jnp.linalg.cholesky(K)
    I = jnp.eye(K.shape[0], dtype=K.dtype)
    Y = jax.scipy.linalg.solve_triangular(L, I, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, Y, lower=False)


def _polish(P, q, A, l, u, x, y, steps: int, eps_active: float = 1e-4):
    """Active-set polish (OSQP-style): treat near-active rows as equalities
    and solve the equality-constrained KKT system by regularized normal
    equations + iterative refinement. Shape-static: inactive rows are zeroed
    rather than removed."""
    n = P.shape[0]
    dtype = P.dtype
    Ax = A @ x
    lo_act = (Ax - l) < eps_active * (1.0 + jnp.abs(l))
    hi_act = (u - Ax) < eps_active * (1.0 + jnp.abs(u))
    act = jnp.logical_or(lo_act, hi_act)
    b_act = jnp.where(hi_act, u, l)
    Aa = A * act[:, None].astype(dtype)
    ba = jnp.where(act, b_act, 0.0).astype(dtype)

    delta = 1e-7
    K = jnp.block([
        [P + delta * jnp.eye(n, dtype=dtype), Aa.T],
        [Aa, -delta * jnp.eye(A.shape[0], dtype=dtype)],
    ])
    rhs = jnp.concatenate([-q, ba])
    sol = jnp.zeros_like(rhs)
    lu, piv = jax.scipy.linalg.lu_factor(K)

    def ref_body(sol, _):
        r = rhs - K @ sol
        d = jax.scipy.linalg.lu_solve((lu, piv), r)
        return sol + d, None

    sol, _ = jax.lax.scan(ref_body, sol, None, length=steps)
    x_p = sol[:n]
    y_p = jnp.where(act, sol[n:], 0.0)

    # Accept polish only if it does not violate inactive constraints and
    # improves the dual residual (guards against a wrong active-set guess).
    Axp = A @ x_p
    feas = jnp.all(Axp >= l - 1e-6) & jnp.all(Axp <= u + 1e-6)
    dual_old = jnp.max(jnp.abs(P @ x + q + A.T @ y))
    dual_new = jnp.max(jnp.abs(P @ x_p + q + A.T @ y_p))
    ok = feas & (dual_new <= dual_old + 1e-12) & jnp.all(jnp.isfinite(x_p))
    x = jnp.where(ok, x_p, x)
    y = jnp.where(ok, y_p, y)
    return x, y


def solve_batch(problems: QPProblem, states: Optional[QPState] = None, **kw):
    """vmapped solve over a leading batch axis on every leaf."""
    fn = partial(solve, **kw)
    if states is None:
        return jax.vmap(lambda p: fn(p))(problems)
    return jax.vmap(fn)(problems, states)
