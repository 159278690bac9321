"""PDIP backstop solver vs the scipy oracle and the ADMM path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qppvm_tpu.opt import pdip, qp
from tests.test_qp import _oracle, _random_qp


@pytest.mark.parametrize("seed", range(4))
def test_pdip_matches_oracle(seed):
    prob = _random_qp(jax.random.PRNGKey(seed))
    x, info = pdip.solve(prob, iters=18)
    x_ref, f_ref = _oracle(prob)
    assert float(info.obj) <= f_ref + 1e-6 * (1 + abs(f_ref))
    Ax = np.asarray(prob.A) @ np.asarray(x)
    assert np.all(Ax >= np.asarray(prob.l) - 1e-6)
    assert np.all(Ax <= np.asarray(prob.u) + 1e-6)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-4)


def test_pdip_agrees_with_admm():
    prob = _random_qp(jax.random.PRNGKey(11))
    x_ip, _ = pdip.solve(prob, iters=18)
    x_admm, _, _ = qp.solve(prob, iters=200, refine=3)
    np.testing.assert_allclose(np.asarray(x_ip), np.asarray(x_admm),
                               atol=2e-5)


def test_pdip_equalities():
    prob = _random_qp(jax.random.PRNGKey(2), eq_rows=3)
    x, info = pdip.solve(prob, iters=18)
    Ax = np.asarray(prob.A @ x)
    np.testing.assert_allclose(Ax[:3], np.asarray(prob.l[:3]), atol=1e-6)


def test_pdip_jit_and_vmap():
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    probs = jax.vmap(_random_qp)(keys)
    xs, infos = jax.jit(jax.vmap(lambda p: pdip.solve(p, iters=18)))(probs)
    assert xs.shape == (6, 12)
    x0, _ = pdip.solve(jax.tree.map(lambda a: a[2], probs), iters=18)
    np.testing.assert_allclose(np.asarray(xs[2]), np.asarray(x0), atol=1e-8)
