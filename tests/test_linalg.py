"""Matmul-only linear algebra (Newton-Schulz) vs exact Cholesky/LU oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qppvm_tpu.opt import linalg

DT = jnp.float64


def _spd(key, n, cond=100.0):
    Q, _ = jnp.linalg.qr(jax.random.normal(key, (n, n), DT))
    eigs = jnp.logspace(0, np.log10(cond), n).astype(DT)
    return (Q * eigs) @ Q.T


@pytest.mark.parametrize("cond", [10.0, 1e3, 1e5])
def test_ns_inverse_matches_chol(cond):
    K = _spd(jax.random.PRNGKey(0), 24, cond)
    X_ns = linalg.spd_inverse_ns(K, iters=30, refine=4)
    X_ch = linalg.spd_inverse_chol(K)
    err = float(jnp.max(jnp.abs(X_ns - X_ch)) / jnp.max(jnp.abs(X_ch)))
    assert err < 1e-8, err


def test_ns_inverse_batched():
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    Ks = jnp.stack([_spd(k, 12, 50.0) for k in keys])
    Xs = linalg.spd_inverse_ns(Ks, iters=25)
    I = jnp.eye(12, dtype=DT)
    res = jnp.max(jnp.abs(Ks @ Xs - I))
    assert float(res) < 1e-9


def test_ns_float32_accuracy_moderate_cond():
    """fp32 hot-path condition: WBC KKT matrices (Ruiz-equilibrated) sit
    around cond 1e2-1e4 — NS must reach ~1e-5 there."""
    K = _spd(jax.random.PRNGKey(2), 44, 1e3).astype(jnp.float32)
    X = linalg.spd_inverse_ns(K, iters=26)
    I = jnp.eye(44, dtype=jnp.float32)
    res = float(jnp.max(jnp.abs(K @ X - I)))
    assert res < 1e-3, res


def test_kkt_schur_solve():
    key = jax.random.PRNGKey(3)
    n, m = 10, 4
    k1, k2, k3, k4 = jax.random.split(key, 4)
    M = jax.random.normal(k1, (n, n), DT)
    P = M @ M.T + 0.1 * jnp.eye(n, dtype=DT)
    A = jax.random.normal(k2, (m, n), DT)
    rx = jax.random.normal(k3, (n,), DT)
    ry = jax.random.normal(k4, (m,), DT)
    delta = 1e-8
    x, y = linalg.kkt_solve_schur(P, A, rx, ry, delta, method="ns", refine=4)
    # check against dense KKT solve
    K = np.block([[np.asarray(P) + delta * np.eye(n), np.asarray(A).T],
                  [np.asarray(A), -delta * np.eye(m)]])
    sol = np.linalg.solve(K, np.concatenate([rx, ry]))
    np.testing.assert_allclose(np.asarray(x), sol[:n], atol=1e-7)
    np.testing.assert_allclose(np.asarray(y), sol[n:], atol=1e-7)


def test_kkt_schur_with_zeroed_rows():
    """Inactive (zeroed) constraint rows must not break the solve."""
    key = jax.random.PRNGKey(5)
    n, m = 8, 5
    M = jax.random.normal(key, (n, n), DT)
    P = M @ M.T + 0.5 * jnp.eye(n, dtype=DT)
    A = jnp.zeros((m, n), DT).at[0, 0].set(1.0).at[2, 3].set(2.0)
    rx = jnp.ones(n, DT)
    ry = jnp.zeros(m, DT).at[0].set(0.5)
    x, y = linalg.kkt_solve_schur(P, A, rx, ry, 1e-8, refine=4)
    # row 0 constraint: x[0] ~= 0.5 ; row 2: 2*x[3] ~= 0
    np.testing.assert_allclose(float(x[0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(x[3]), 0.0, atol=1e-6)
