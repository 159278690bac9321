"""Pallas NS-inverse kernel vs the XLA reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from qppvm_tpu.opt import linalg
from qppvm_tpu.opt.pallas_linalg import ns_inverse_pallas


def _spd_batch(key, B, n, cond=300.0):
    def one(k):
        Q, _ = jnp.linalg.qr(jax.random.normal(k, (n, n), jnp.float32))
        eigs = jnp.logspace(0, np.log10(cond), n).astype(jnp.float32)
        return (Q * eigs) @ Q.T
    return jax.vmap(one)(jax.random.split(key, B))


def test_pallas_ns_matches_xla():
    K = _spd_batch(jax.random.PRNGKey(0), 6, 32)
    X_p = ns_inverse_pallas(K, iters=26, tile=2, interpret=True)
    X_x = linalg.spd_inverse_ns(K, iters=26)
    np.testing.assert_allclose(np.asarray(X_p), np.asarray(X_x),
                               atol=2e-4, rtol=2e-3)
    I = jnp.eye(32, dtype=jnp.float32)
    res = jnp.max(jnp.abs(K @ X_p - I[None]))
    assert float(res) < 5e-3


def test_pallas_ns_padding():
    K = _spd_batch(jax.random.PRNGKey(1), 5, 16)  # B=5 not divisible by tile
    X = ns_inverse_pallas(K, iters=24, tile=4, interpret=True)
    assert X.shape == (5, 16, 16)
    I = jnp.eye(16, dtype=jnp.float32)
    assert float(jnp.max(jnp.abs(K @ X - I[None]))) < 5e-3
