"""Correctness tests for the rigid-body dynamics core.

Strategy (SURVEY.md §4): the reference has no tests; we validate RNEA / mass
matrix / Jacobians against finite differences and first-principles identities
(energy conservation, potential-energy gradient), in float64 on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qppvm_tpu.model import dynamics, kinematics, spatial, zoo
from qppvm_tpu.model.robot import RobotState

DT = jnp.float64


def _rand_state(model, key, dtype=DT, moving=True, random_base=True):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    q = jax.random.uniform(k1, (model.nj,), dtype, -1.0, 1.0)
    qd = jax.random.uniform(k2, (model.nj,), dtype, -1.0, 1.0) if moving else jnp.zeros(model.nj, dtype)
    if model.floating and random_base:
        w = jax.random.uniform(k3, (3,), dtype, -1.0, 1.0)
        base_rot = spatial.so3_exp(w)
        base_pos = jax.random.uniform(k4, (3,), dtype, -1.0, 1.0)
        base_vel = jax.random.uniform(k5, (6,), dtype, -1.0, 1.0) if moving else jnp.zeros(6, dtype)
    else:
        base_rot, base_pos, base_vel = jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype), jnp.zeros(6, dtype)
    return RobotState(q=q, qd=qd, base_rot=base_rot, base_pos=base_pos,
                      base_vel=base_vel)


MODELS = ["arm7", "dual_arm", "quadruped", "biped", "humanoid"]


@pytest.mark.parametrize("name", MODELS)
def test_jacobian_vs_finite_difference(name):
    model = zoo.by_name(name)
    state = _rand_state(model, jax.random.PRNGKey(0), moving=False)
    kin = kinematics.fk(model, state)
    J = kinematics.all_link_jacobians(model, kin)
    eps = 1e-7

    # Joint columns: perturb each q_i.
    col0 = 6 if model.floating else 0
    for j in range(model.nj):
        dq = state.q.at[j].add(eps)
        kin2 = kinematics.fk(model, dataclasses_replace(state, q=dq))
        dp = (kin2.p - kin.p) / eps                     # (nj, 3) linear
        np.testing.assert_allclose(np.asarray(J[:, :3, col0 + j]), np.asarray(dp),
                                   atol=1e-5)
        dR = (kin2.R - kin.R) / eps
        # dR R^T = skew(w_column)
        W = np.einsum("nij,nkj->nik", np.asarray(dR), np.asarray(kin.R))
        w = np.stack([W[:, 2, 1], W[:, 0, 2], W[:, 1, 0]], axis=-1)
        np.testing.assert_allclose(np.asarray(J[:, 3:, col0 + j]), w, atol=1e-5)

    if model.floating:
        # Base columns: integrate with pure base twist for a small dt.
        for c in range(6):
            u = jnp.zeros(model.nv, DT).at[c].set(1.0)
            st = RobotState(q=state.q, qd=u[6:], base_rot=state.base_rot,
                            base_pos=state.base_pos, base_vel=u[:6])
            st2 = dynamics.integrate(model, st, jnp.zeros(model.nv, DT), eps)
            kin2 = kinematics.fk(model, st2)
            dp = (kin2.p - kin.p) / eps
            np.testing.assert_allclose(np.asarray(J[:, :3, c]), np.asarray(dp),
                                       atol=1e-5)


def dataclasses_replace(state, **kw):
    import dataclasses
    return dataclasses.replace(state, **kw)


@pytest.mark.parametrize("name", MODELS)
def test_mass_matrix_vs_rnea(name):
    """B @ udot == RNEA(q, 0, udot) with gravity off — both floating & fixed."""
    model = zoo.by_name(name)
    state = _rand_state(model, jax.random.PRNGKey(1), moving=False)
    B = dynamics.mass_matrix(model, state)
    # symmetry + positive definiteness
    np.testing.assert_allclose(np.asarray(B), np.asarray(B.T), atol=1e-10)
    assert np.all(np.linalg.eigvalsh(np.asarray(B)) > 0)
    for trial in range(3):
        udot = jax.random.normal(jax.random.PRNGKey(10 + trial), (model.nv,), DT)
        tau = dynamics.rnea(model, state, udot, gravity=False)
        np.testing.assert_allclose(np.asarray(tau), np.asarray(B @ udot),
                                   rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("name", ["arm7", "quadruped", "humanoid"])
def test_gravity_term_vs_potential_gradient(name):
    """h(q, 0) joint rows == dV/dq with V = -sum m_i g . com_i."""
    model = zoo.by_name(name)
    state = _rand_state(model, jax.random.PRNGKey(2), moving=False)
    h = dynamics.nonlinear_term(model, state)
    col0 = 6 if model.floating else 0

    def V(q):
        kin = kinematics.fk(model, dataclasses_replace(state, q=q))
        m, c = kinematics.com(model, kin)
        return -m * jnp.dot(model.gravity.astype(DT), c)

    gV = jax.grad(V)(state.q)
    np.testing.assert_allclose(np.asarray(h[col0:]), np.asarray(gV),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("name", ["arm7", "quadruped"])
def test_coriolis_skew_property(name):
    """u^T (Bdot - 2C) u = 0  =>  u^T C u == 0.5 u^T Bdot u."""
    model = zoo.by_name(name)
    state = _rand_state(model, jax.random.PRNGKey(3))
    u = state.u if model.floating else state.qd
    h_nog = dynamics.rnea(model, state, jnp.zeros(model.nv, DT), gravity=False)
    power_coriolis = jnp.dot(u, h_nog)
    eps = 1e-7
    st2 = dynamics.integrate(model, state, jnp.zeros(model.nv, DT), eps)
    Bdot = (dynamics.mass_matrix(model, st2) - dynamics.mass_matrix(model, state)) / eps
    np.testing.assert_allclose(float(power_coriolis), float(0.5 * u @ Bdot @ u),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["arm7", "quadruped"])
def test_forward_inverse_roundtrip(name):
    model = zoo.by_name(name)
    state = _rand_state(model, jax.random.PRNGKey(4))
    tau = jax.random.normal(jax.random.PRNGKey(5), (model.nj,), DT)
    udot = dynamics.forward_dynamics(model, state, tau)
    tau_back = dynamics.inverse_dynamics(model, state, udot)
    if model.floating:
        np.testing.assert_allclose(np.asarray(tau_back[:6]),
                                   np.zeros(6), atol=1e-6)
        np.testing.assert_allclose(np.asarray(tau_back[6:]), np.asarray(tau),
                                   rtol=1e-5, atol=1e-6)
    else:
        np.testing.assert_allclose(np.asarray(tau_back), np.asarray(tau),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["arm7", "quadruped"])
def test_bias_acceleration_vs_finite_difference(name):
    """Jdot*u == d/dt (J u) at constant u."""
    model = zoo.by_name(name)
    state = _rand_state(model, jax.random.PRNGKey(6))
    kin = kinematics.fk(model, state)
    bias = kinematics.bias_accelerations(model, kin, state)
    u = state.u if model.floating else state.qd
    eps = 1e-7
    st2 = dynamics.integrate(model, state, jnp.zeros(model.nv, DT), eps)
    kin2 = kinematics.fk(model, st2)
    v1 = jnp.einsum("nrv,v->nr", kinematics.all_link_jacobians(model, kin), u)
    v2 = jnp.einsum("nrv,v->nr", kinematics.all_link_jacobians(model, kin2), u)
    fd = (v2 - v1) / eps
    np.testing.assert_allclose(np.asarray(bias), np.asarray(fd), atol=2e-5)


def test_energy_conservation_free_fall():
    """Torque-free quadruped in gravity: E = KE + V conserved under RK4."""
    model = zoo.quadruped()
    state = _rand_state(model, jax.random.PRNGKey(7))

    def energy(st):
        kin = kinematics.fk(model, st)
        m, c = kinematics.com(model, kin)
        return dynamics.kinetic_energy(model, st) - m * jnp.dot(
            model.gravity.astype(DT), c)

    def deriv(st):
        return dynamics.forward_dynamics(model, st, jnp.zeros(model.nj, DT))

    dt = 1e-4
    e0 = float(energy(state))
    st = state
    for _ in range(100):
        # RK2 midpoint on (state, u) — enough for a tight-dt energy check
        ud1 = deriv(st)
        mid = dynamics.integrate(model, st, ud1, dt / 2)
        ud2 = deriv(mid)
        st = dynamics.integrate(model, st, ud2, dt)
    e1 = float(energy(st))
    assert abs(e1 - e0) < 1e-3 * max(1.0, abs(e0))


def test_com_height_drops_in_free_fall():
    model = zoo.biped()
    st = RobotState.init(model, model.q_home, dtype=DT)
    kin0 = kinematics.fk(model, st)
    _, c0 = kinematics.com(model, kin0)
    for _ in range(50):
        ud = dynamics.forward_dynamics(model, st, jnp.zeros(model.nj, DT))
        st = dynamics.integrate(model, st, ud, 1e-3)
    _, c1 = kinematics.com(model, kinematics.fk(model, st))
    assert float(c1[2]) < float(c0[2])


def test_pose_error_roundtrip():
    key = jax.random.PRNGKey(8)
    w = jax.random.uniform(key, (3,), DT, -1.0, 1.0)
    R_ref = spatial.so3_exp(w)
    R = jnp.eye(3, dtype=DT)
    e = spatial.pose_error(R_ref, jnp.zeros(3, DT), R, jnp.zeros(3, DT))
    np.testing.assert_allclose(np.asarray(e[3:]), np.asarray(w), rtol=1e-6,
                               atol=1e-8)
    # exp(log(R)) == R
    np.testing.assert_allclose(np.asarray(spatial.so3_exp(e[3:])),
                               np.asarray(R_ref), atol=1e-8)


@pytest.mark.parametrize("name", ["quadruped", "humanoid"])
def test_com_velocity_vs_finite_difference(name):
    """com_velocity (the force::CoM task's measured damping signal) must be
    the time derivative of the com position along the true kinematics."""
    model = zoo.by_name(name)
    state = _rand_state(model, jax.random.PRNGKey(3), moving=True)
    kin = kinematics.fk(model, state)
    J_all = kinematics.all_link_jacobians(model, kin)
    u = state.u if model.floating else state.qd
    vel_all = jnp.einsum("nrv,v->nr", J_all, u)
    v_com = kinematics.com_velocity(model, kin, state, vel_all)

    eps = 1e-7
    st2 = dynamics.integrate(model, state, jnp.zeros(model.nv, DT), eps)
    _, com1 = kinematics.com(model, kin)
    _, com2 = kinematics.com(model, kinematics.fk(model, st2))
    v_fd = (com2 - com1) / eps
    np.testing.assert_allclose(np.asarray(v_com), np.asarray(v_fd), atol=1e-5)


@pytest.mark.parametrize("name", ["dual_arm", "humanoid"])
def test_relative_frame_data_vs_finite_difference(name):
    """Non-world base_link kinematics (relative Cartesian tasks): J_rel u
    must equal the time derivative of the relative pose, and bias_rel the
    derivative of the relative velocity at udot = 0."""
    model = zoo.by_name(name)
    distal, base = ("arm1_7", "arm2_4") if name == "dual_arm" else \
        ("l_sole", "pelvis")
    state = _rand_state(model, jax.random.PRNGKey(5), moving=True)
    data = dynamics.compute_model_data(model, state)
    R0, p0, J, v0, bias = dynamics.relative_frame_data(model, data, distal,
                                                       base)
    u = state.u if model.floating else state.qd
    # velocity consistency: vel == J_rel u
    np.testing.assert_allclose(np.asarray(v0), np.asarray(J @ u), atol=1e-10)

    eps = 1e-7
    st2 = dynamics.integrate(model, state, jnp.zeros(model.nv, DT), eps)
    data2 = dynamics.compute_model_data(model, st2)
    R1, p1, _, v1, _ = dynamics.relative_frame_data(model, data2, distal,
                                                    base)
    # linear: pdot_rel == v_rel[:3]
    np.testing.assert_allclose(np.asarray((p1 - p0) / eps),
                               np.asarray(v0[:3]), atol=1e-5)
    # angular: vee(Rdot_rel R_rel^T) == v_rel[3:]
    W = np.asarray((R1 - R0) / eps) @ np.asarray(R0).T
    w_fd = np.array([W[2, 1], W[0, 2], W[1, 0]])
    np.testing.assert_allclose(w_fd, np.asarray(v0[3:]), atol=1e-5)
    # bias: d(vel_rel)/dt at udot = 0
    np.testing.assert_allclose(np.asarray((v1 - v0) / eps),
                               np.asarray(bias), atol=2e-5)
