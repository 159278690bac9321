"""iLQR/DDP planner: analytic-LQR agreement, centroidal MPC behavior.

The planner is greenfield vs the reference (SURVEY.md §2c) — the oracle is
mathematics: on a linear-quadratic problem iLQR must recover the LQR
solution in one iteration; on the centroidal model it must produce a
physically sensible force plan (weight distribution, squat tracking).
"""
import jax
import jax.numpy as jnp
import numpy as np

from qppvm_tpu.mpc import centroidal, ilqr


def _lqr_problem(nx=4, nu=2, H=30, seed=0):
    rng = np.random.default_rng(seed)
    A = np.eye(nx) + 0.05 * rng.standard_normal((nx, nx))
    B = 0.1 * rng.standard_normal((nx, nu))
    Q = np.eye(nx)
    R = 0.1 * np.eye(nu)
    x0 = rng.standard_normal(nx)
    return (jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32),
            jnp.asarray(Q, jnp.float32), jnp.asarray(R, jnp.float32),
            jnp.asarray(x0, jnp.float32), H)


def _lqr_riccati(A, B, Q, R, H):
    """Finite-horizon discrete LQR via backward Riccati (numpy oracle)."""
    A, B, Q, R = map(np.asarray, (A, B, Q, R))
    P = Q.copy()
    Ks = []
    for _ in range(H):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ (A - B @ K)
        Ks.append(K)
    return Ks[::-1]


def test_ilqr_matches_lqr():
    A, B, Q, R, x0, H = _lqr_problem()

    def dyn(x, u):
        return A @ x + B @ u

    def cost(x, u):
        return 0.5 * (x @ Q @ x + u @ R @ u)

    def final(x):
        return 0.5 * x @ Q @ x

    solve = ilqr.make_solver(dyn, cost, final,
                             ilqr.ILQRConfig(iterations=3))
    U0 = jnp.zeros((H, B.shape[1]), jnp.float32)
    res = jax.jit(solve)(x0, U0)

    # oracle: simulate the Riccati policy
    Ks = _lqr_riccati(A, B, Q, R, H)
    x = np.asarray(x0)
    c_opt = 0.0
    for t in range(H):
        u = -Ks[t] @ x
        c_opt += 0.5 * (x @ np.asarray(Q) @ x + u @ np.asarray(R) @ u)
        x = np.asarray(A) @ x + np.asarray(B) @ u
    c_opt += 0.5 * x @ np.asarray(Q) @ x

    assert np.isfinite(float(res.cost))
    np.testing.assert_allclose(float(res.cost), c_opt, rtol=1e-3)


def test_ilqr_feedback_gains_stabilize():
    A, B, Q, R, x0, H = _lqr_problem(seed=3)

    def dyn(x, u):
        return A @ x + B @ u

    def cost(x, u):
        return 0.5 * (x @ Q @ x + u @ R @ u)

    solve = ilqr.make_solver(dyn, cost, lambda x: 0.5 * x @ Q @ x,
                             ilqr.ILQRConfig(iterations=3))
    res = solve(x0, jnp.zeros((H, 2), jnp.float32))
    # apply the returned time-varying feedback from a perturbed start
    x = np.asarray(x0) + 0.1
    for t in range(H):
        u = np.asarray(res.U[t]) + np.asarray(res.K[t]) @ (
            x - np.asarray(res.X[t]))
        x = np.asarray(A) @ x + np.asarray(B) @ u
    assert np.linalg.norm(x) < np.linalg.norm(np.asarray(x0) + 0.1)


def _params(dtype=jnp.float32):
    feet = jnp.asarray([[0.1, 0.1, 0.0], [0.1, -0.1, 0.0],
                        [-0.1, 0.1, 0.0], [-0.1, -0.1, 0.0]], dtype)
    return centroidal.CentroidalParams(
        mass=jnp.asarray(40.0, dtype),
        inertia=jnp.eye(3, dtype=dtype) * 2.0,
        footholds=feet, active=jnp.ones(4, dtype),
        gravity=jnp.asarray([0.0, 0.0, -9.81], dtype),
        dt=jnp.asarray(0.02, dtype))


def test_centroidal_hover_forces():
    """Standing: optimal plan distributes the weight over the 4 contacts."""
    params = _params()
    p0 = jnp.asarray([0.0, 0.0, 0.5])
    x0 = centroidal.init_state(p0)
    cost = centroidal.standing_cost(params, p_ref=p0)
    dyn = lambda x, u: centroidal.dynamics_step(params, x, u)
    H = 20
    solve = ilqr.make_solver(dyn, cost, lambda x: 10.0 * cost(x, jnp.zeros(12)),
                             ilqr.ILQRConfig(iterations=8))
    U0 = jnp.tile(centroidal.gravity_feedforward(params)[None], (H, 1))
    res = jax.jit(solve)(x0, U0)
    F = np.asarray(res.U[0]).reshape(4, 3)
    weight = 40.0 * 9.81
    assert abs(F[:, 2].sum() - weight) < 0.05 * weight, F
    # roughly symmetric distribution
    assert np.all(F[:, 2] > 0.15 * weight)
    # com stays put
    drift = np.linalg.norm(np.asarray(res.X[-1][:3]) - np.asarray(p0))
    assert drift < 0.01, drift


def test_centroidal_squat_tracking():
    """Reference 10 cm below: plan moves the CoM down then re-supports."""
    params = _params()
    p0 = jnp.asarray([0.0, 0.0, 0.5])
    x0 = centroidal.init_state(p0)
    p_ref = p0 - jnp.asarray([0.0, 0.0, 0.1])
    cost = centroidal.standing_cost(params, p_ref=p_ref)
    dyn = lambda x, u: centroidal.dynamics_step(params, x, u)
    H = 40
    solve = ilqr.make_solver(dyn, cost,
                             lambda x: 50.0 * cost(x, jnp.zeros(12)),
                             ilqr.ILQRConfig(iterations=10))
    U0 = jnp.tile(centroidal.gravity_feedforward(params)[None], (H, 1))
    res = jax.jit(solve)(x0, U0)
    z_final = float(res.X[-1][2])
    assert abs(z_final - 0.4) < 0.03, z_final
    assert np.all(np.isfinite(np.asarray(res.U)))


def test_contact_gating_zeroes_forces():
    """Deactivated foothold contributes no force (static 0/1 gate)."""
    params = _params()
    params = centroidal.CentroidalParams(
        mass=params.mass, inertia=params.inertia,
        footholds=params.footholds,
        active=jnp.asarray([0.0, 1.0, 1.0, 1.0]),
        gravity=params.gravity, dt=params.dt)
    x0 = centroidal.init_state(jnp.asarray([0.0, 0.0, 0.5]))
    u = centroidal.gravity_feedforward(params)
    F = np.asarray(u).reshape(4, 3)
    assert F[0, 2] == 0.0
    assert abs(F[1:, 2].sum() - 40.0 * 9.81) < 1.0
    # dynamics ignores forces on inactive contact
    u_bad = u + jnp.asarray([0.0, 0.0, 1000.0] + [0.0] * 9)
    x1a = centroidal.dynamics_step(params, x0, u)
    x1b = centroidal.dynamics_step(params, x0, u_bad)
    np.testing.assert_allclose(np.asarray(x1a), np.asarray(x1b), atol=1e-6)
