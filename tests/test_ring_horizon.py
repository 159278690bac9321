"""Horizon-parallel multiple-shooting rollout (parallel/ring_horizon.py) on
the virtual 8-device CPU mesh — the SP-analog growth path of SURVEY.md §2c."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qppvm_tpu.parallel import mesh as meshlib
from qppvm_tpu.parallel.ring_horizon import ring_rollout


def _step(c, u):
    """Nonlinear, non-commuting test dynamics with a pytree carry."""
    x, v = c
    x2 = jnp.tanh(0.9 * x + 0.3 * u) + 0.05 * v
    v2 = 0.8 * v + 0.1 * jnp.sin(x) + u
    return (x2, v2), (x2, jnp.sum(v2))


@pytest.fixture(scope="module")
def setup():
    mesh = meshlib.make_mesh(4, axis="seg")
    T, d = 16, 5
    key = jax.random.PRNGKey(0)
    U = jax.random.normal(key, (T, d), jnp.float64) * 0.5
    x0 = (jnp.linspace(-1.0, 1.0, d), jnp.zeros(d))
    ref_final, ref_outs = jax.lax.scan(_step, x0, U)
    return mesh, x0, U, ref_final, ref_outs


def test_exact_when_sweeps_equal_segments(setup):
    mesh, x0, U, ref_final, ref_outs = setup
    final, outs, info = ring_rollout(_step, x0, U, mesh, sweeps=None)
    for a, b in zip(jax.tree.leaves(final), jax.tree.leaves(ref_final)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    for a, b in zip(jax.tree.leaves(outs), jax.tree.leaves(ref_outs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    assert float(info.defect) < 1e-12


def test_defect_decreases_with_sweeps(setup):
    mesh, x0, U, _, _ = setup
    defects = []
    for s in (1, 2, 3, 4):
        _, _, info = ring_rollout(_step, x0, U, mesh, sweeps=s)
        defects.append(float(info.defect))
    assert defects[0] > defects[-1]
    assert defects[-1] < 1e-12  # sweeps == S is exact
    assert all(d2 <= d1 + 1e-12 for d1, d2 in zip(defects, defects[1:]))


def test_warm_boundaries_give_exact_single_sweep(setup):
    mesh, x0, U, ref_final, ref_outs = setup
    # Settle boundaries once (exact), then a single warm sweep must stay exact
    # (the MPC warm-start usage pattern).
    _, _, info = ring_rollout(_step, x0, U, mesh, sweeps=None)
    final, outs, info2 = ring_rollout(_step, x0, U, mesh, sweeps=1,
                                      boundary_guess=info.boundaries)
    assert float(info2.defect) < 1e-12
    for a, b in zip(jax.tree.leaves(outs), jax.tree.leaves(ref_outs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_jit_and_grad_through_ring(setup):
    mesh, x0, U, _, _ = setup

    @jax.jit
    def loss(U):
        final, _, _ = ring_rollout(_step, x0, U, mesh, sweeps=None)
        return jnp.sum(final[0] ** 2)

    def loss_seq(U):
        final, _ = jax.lax.scan(_step, x0, U)
        return jnp.sum(final[0] ** 2)

    g_ring = jax.grad(loss)(U)
    g_seq = jax.grad(loss_seq)(U)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_seq),
                               atol=1e-10)


def test_bad_horizon_raises(setup):
    mesh, x0, U, _, _ = setup
    with pytest.raises(ValueError):
        ring_rollout(_step, x0, U[:15], mesh)
