"""Parity: the fused Pallas whole-solve kernel vs opt/qp.py.

The kernel (opt/pallas_qp.py) re-implements the deployed ADMM profile in
batch-on-lanes form; these tests pin it numerically against the XLA path
it replaces, on WBC-shaped problems (PSD objective + structural equality
rows + box-bounded affine rows + warm starts), in Pallas interpret mode
so the identical kernel code runs in the CPU suite.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qppvm_tpu.opt import pallas_qp, qp


def _make_problems(key, B, n, m, n_eq_head, n_eq_tail):
    ks = jax.random.split(key, 6)
    T = jax.random.normal(ks[0], (B, n + 4, n)) / np.sqrt(n)
    P = jnp.einsum("bki,bkj->bij", T, T) + 1e-3 * jnp.eye(n)
    q = 0.3 * jax.random.normal(ks[1], (B, n))
    A = jax.random.normal(ks[2], (B, m, n)) / np.sqrt(n)
    # structural equalities: l == u on head/tail rows
    b = 0.1 * jax.random.normal(ks[3], (B, m))
    lo = b - 0.5 - jax.random.uniform(ks[4], (B, m))
    hi = b + 0.5 + jax.random.uniform(ks[5], (B, m))
    eq_mask = jnp.zeros((m,), bool)
    if n_eq_head:
        eq_mask = eq_mask.at[:n_eq_head].set(True)
    if n_eq_tail:
        eq_mask = eq_mask.at[m - n_eq_tail:].set(True)
    l = jnp.where(eq_mask[None, :], b, lo)
    u = jnp.where(eq_mask[None, :], b, hi)
    # pin f32 (the kernel's deployed dtype) even under the suite's x64 mode
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    return qp.QPProblem(P=f32(P), q=f32(q), A=f32(A), l=f32(l), u=f32(u))


def _opts(n_eq_head, n_eq_tail, warm_kinv=4, cold_ns=None):
    return dict(iters=12, refine=2, rho_updates=0, polish_rounds=0,
                assume_warm_kinv=True, warm_kinv_iters=warm_kinv,
                cold_ns_iters=cold_ns, scale_iters=2, pinv_ns_iters=5,
                rho_adapt_tol=1e-3, rho_scale_min=0.1,
                n_eq_head=n_eq_head, n_eq_tail=n_eq_tail)


@pytest.mark.parametrize("n_eq_head,n_eq_tail,cold_ns",
                         [(3, 2, None), (3, 2, 10), (0, 0, None)])
def test_kernel_matches_xla_path(n_eq_head, n_eq_tail, cold_ns):
    B, n, m = 8, 20, 10
    prob = _make_problems(jax.random.PRNGKey(0), B, n, m,
                          n_eq_head, n_eq_tail)
    opts = _opts(n_eq_head, n_eq_tail, cold_ns=cold_ns)

    # two XLA ticks: the first (cold) builds a realistic warm state so the
    # second tick exercises the guarded warm-NS path the kernel fuses
    states0 = jax.vmap(lambda: qp.QPState.zero(n, m), axis_size=B)()
    solve_ref = jax.vmap(lambda p, s: qp.solve(p, s, **opts))
    _, warm, _ = solve_ref(prob, states0)
    x_ref, st_ref, info_ref = solve_ref(prob, warm)

    cfg = pallas_qp.config_from_opts(opts, n_eq_head=n_eq_head,
                                     n_eq_tail=n_eq_tail, iters=12,
                                     interpret=True)
    assert cfg is not None
    x, z, y, K, r, prim, dual, obj = pallas_qp.solve_batched(
        cfg, prob.P, prob.q, prob.A, prob.l, prob.u,
        warm.x, warm.z, warm.y, warm.Kinv, warm.rho_scale)

    sc = float(jnp.max(jnp.abs(x_ref))) + 1.0
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=2e-4 * sc, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(z), np.asarray(st_ref.z),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(st_ref.y),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(K), np.asarray(st_ref.Kinv),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(r),
                               np.asarray(st_ref.rho_scale),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(prim),
                               np.asarray(info_ref.prim_res),
                               atol=1e-5, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(obj), np.asarray(info_ref.obj),
                               atol=1e-4, rtol=1e-3)


def test_custom_vmap_facade_routes_batch():
    """vmap(make_level_solver(cfg)) must produce the kernel's results with
    qp.solve's per-item signature (the hierarchy integration contract)."""
    B, n, m = 8, 16, 8
    h, t = 2, 1
    prob = _make_problems(jax.random.PRNGKey(3), B, n, m, h, t)
    opts = _opts(h, t)
    states0 = jax.vmap(lambda: qp.QPState.zero(n, m), axis_size=B)()
    _, warm, _ = jax.vmap(lambda p, s: qp.solve(p, s, **opts))(prob, states0)

    cfg = pallas_qp.config_from_opts(opts, n_eq_head=h, n_eq_tail=t,
                                     iters=12, interpret=True)
    solver = pallas_qp.make_level_solver(cfg)
    x_v, st_v, info_v = jax.vmap(solver)(prob, warm)

    x_k, z_k, y_k, K_k, r_k, prim_k, _, _ = pallas_qp.solve_batched(
        cfg, prob.P, prob.q, prob.A, prob.l, prob.u,
        warm.x, warm.z, warm.y, warm.Kinv, warm.rho_scale)
    np.testing.assert_allclose(np.asarray(x_v), np.asarray(x_k),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st_v.Kinv), np.asarray(K_k),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(info_v.prim_res),
                               np.asarray(prim_k), atol=1e-7, rtol=1e-6)

    # unbatched call = XLA fallback, same answer as vmapped item 0
    item = jax.tree.map(lambda a: a[0], (prob, warm))
    x_1, _, _ = solver(*item)
    np.testing.assert_allclose(np.asarray(x_1), np.asarray(x_v[0]),
                               atol=5e-4, rtol=5e-4)


def test_kernel_under_scan_carries_warm_state():
    """The deployed shape: the solve inside a lax.scan chain with the warm
    state (incl. KKT inverse) carried across ticks, vmapped over a batch —
    residuals must stay tiny along the chain (warm path accepted)."""
    B, n, m = 4, 16, 8
    h, t = 2, 0
    prob = _make_problems(jax.random.PRNGKey(5), B, n, m, h, t)
    opts = _opts(h, t)
    cfg = pallas_qp.config_from_opts(opts, n_eq_head=h, n_eq_tail=t,
                                     iters=12, interpret=True)
    solver = pallas_qp.make_level_solver(cfg)
    states0 = jax.vmap(lambda: qp.QPState.zero(n, m), axis_size=B)()

    def chain_item(p, s0):
        def tick(st, _):
            x, st_new, info = solver(p, st)
            return st_new, info.prim_res
        _, prims = jax.lax.scan(tick, s0, None, length=5)
        return prims

    prims = jax.vmap(chain_item)(prob, states0)
    assert np.all(np.isfinite(np.asarray(prims)))
    # after the cold first tick, warm-started ticks converge tightly
    assert float(jnp.max(prims[:, -1])) < 1e-3
