"""Fused VMEM-resident Pallas whole-solve QP kernel (batch-on-lanes).

The north-star centerpiece (BASELINE.json: "replace the qpOASES dense
active-set solve [/root/reference/src/QPPVMPlugin.cpp:21,188] with a
batched *Pallas* QP kernel"): ONE Pallas kernel per cascade level that
keeps a batch tile of QPs resident in VMEM across the ENTIRE solve —
Ruiz equilibration, equality-elimination pseudo-inverse, KKT build,
guarded warm Newton-Schulz inverse, every ADMM iteration, residuals and
unscaling — instead of ~50 separate XLA ops each round-tripping the
batch through HBM.

Why this wins where the round-2 per-item kernel (opt/pallas_linalg.py)
lost 48x: that kernel fed 44x44 per-item matmuls to the MXU one at a
time. This kernel uses a **batch-on-lanes layout**: every per-item
matrix M_b (r x c) is stored as a 3-D VMEM block (r, c, TB) with the
batch tile TB = 128 exactly filling the lane dimension. Consequences:

- Zero lane padding. The XLA path stores (B, 44, 44) f32 as
  (B, 48, 128) tiles — 3.2x memory and HBM traffic amplification on
  every one of its ~50 passes. That padding is the measured 33.5 ms of
  "iteration-independent setup" per 4096-batch MPC step
  (docs/BENCHMARKS.md round 4); here the lane dim is the batch and is
  always full.
- Per-item matmuls become dense full-width VPU ops: a batched
  C_b = A_b^T B_b is a fori accumulation over the contracted dim of
  (sublane-broadcast x tile) fused multiply-adds, every op 128 lanes
  wide. No MXU serialization, no per-item dispatch.
- The whole solve's working set (~8 MB at n=44, TB=128) sits in VMEM
  once; HBM sees each problem exactly twice (read inputs, write
  results).

Algorithmic scope = the DEPLOYED solver profiles (opt/qp.py semantics,
restricted): single rho chunk (rho_updates=0 — closed-loop validated for
flat and cone/6D stacks), no active-set polish (polish_rounds=0; refine>0
keeps only the final z-clip), inv_method="ns", warm-started KKT inverse
with the contraction guard. Everything else (structural-equality
elimination with the NS-refined pseudo-inverse, the Jacobi-prescaled
cold fallback, per-row rho, the cross-tick rho carry policy, relative
residuals, equality-multiplier recovery) is replicated exactly; parity
vs opt/qp.py is pinned in tests/test_pallas_qp.py. One deliberate
deviation, documented where it happens: per-lane problems cannot take
different branch lengths, so when ``cold_ns_iters > warm_kinv_iters``
the kernel runs the cold budget for all lanes and FREEZES warm lanes at
their ``warm_kinv_iters`` iterate — bit-matching the lax.cond semantics
at the cost vmap already pays (under vmap XLA runs both branches too).

Off-TPU the same kernel runs in Pallas interpret mode (pure JAX
semantics), so the CPU test suite and the virtual-device dryrun exercise
the identical code path.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qppvm_tpu.opt import qp


# ---------------------------------------------------------------------------
# static configuration
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PallasQPConfig:
    """Static (trace-time) solver profile for the fused kernel. Field
    semantics match opt/qp.py::solve's keywords."""

    iters: int = 12
    rho: float = 0.1
    sigma: float = 1e-6
    alpha: float = 1.6
    warm_kinv_iters: int = 4
    cold_ns_iters: Optional[int] = None      # None -> warm_kinv_iters
    scale_iters: int = 2
    pinv_ns_iters: int = 5
    gram_ns_iters: int = 26                  # linalg.spd_inverse_ns 24+2
    rho_adapt_tol: float = 1e-3
    rho_scale_min: float = 0.1
    n_eq_head: int = 0
    n_eq_tail: int = 0
    eq_pin: float = 1.0
    z_clip: bool = True                      # the refine>0 final clip
    tile: int = 128                          # batch lanes per grid step
    interpret: bool = False

    @property
    def kinv_iters(self) -> int:
        cold = (self.cold_ns_iters if self.cold_ns_iters is not None
                else self.warm_kinv_iters)
        return max(self.warm_kinv_iters, cold)


def on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


# ---------------------------------------------------------------------------
# batch-on-lanes primitives (operate on VMEM *values* inside the kernel)
#
# Canonical layout: a per-item matrix M_b of shape (r, c) is a value
# (r, c, L) — row index on the outer dim, column index on sublanes, batch
# on lanes. A per-item vector v_b of shape (p,) is a value (p, L).
# ---------------------------------------------------------------------------

def _bmm(A, B):
    """Batched C_b = A_b^T @ B_b: contract over the OUTER (row) dim.
    A (p, n, L), B (p, m, L) -> (n, m, L). Each step is a sublane-broadcast
    outer-product FMA at full lane width. STATICALLY unrolled over the
    contraction dim: Mosaic has no dynamic_slice on VMEM values, and p is
    a trace-time constant anyway."""
    p, n, L = A.shape
    m = B.shape[1]
    C = jnp.zeros((n, m, L), A.dtype)
    for k in range(p):
        C = C + A[k][:, None, :] * B[k][None, :, :]
    return C


def _bmv(M, v):
    """Batched y_b = M_b^T @ v_b (contract outer). M (p, n, L), v (p, L)
    -> (n, L). Symmetric matrices (P, K, Kinv, Pn, Ginv) use this directly
    for M @ v. Static unroll (see _bmm)."""
    p, n, L = M.shape
    acc = jnp.zeros((n, L), M.dtype)
    for k in range(p):
        acc = acc + M[k] * v[k:k + 1]
    return acc


def _rowdots(M, v):
    """Per-row dots y_b[r] = M_b[r, :] . v_b (contract sublanes).
    M (p, n, L), v (n, L) -> (p, L). p is small (constraint rows / eq
    rows) — statically unrolled."""
    p = M.shape[0]
    rows = [jnp.sum(M[r] * v, axis=0, keepdims=True) for r in range(p)]
    return jnp.concatenate(rows, axis=0) if p > 0 else \
        jnp.zeros((0, v.shape[-1]), M.dtype)


def _pairdots(A, B):
    """T_b[r, s] = A_b[r, :] . B_b[s, :]: (p, n, L) x (q, n, L) ->
    (p, q, L). p, q are equality-row counts (<= ~16) — unrolled."""
    p, q = A.shape[0], B.shape[0]
    rows = []
    for r in range(p):
        cols = [jnp.sum(A[r] * B[s], axis=0, keepdims=True)
                for s in range(q)]
        rows.append(jnp.concatenate(cols, axis=0))     # (q, L)
    return jnp.stack(rows, axis=0)                     # (p, q, L)


def _diag(M):
    """Diagonal of each item: (n, n, L) -> (n, L). Static unroll."""
    n = M.shape[0]
    return jnp.concatenate([M[i][i:i + 1, :] for i in range(n)], axis=0)


def _sym(M):
    """Exact symmetrization (0.5*(M + M^T), batch-wise). REQUIRED hygiene,
    not an optimization: ``_bmm(X, .)`` contracts over X's rows, i.e.
    computes X^T(.), which equals X(.) only for a bitwise-symmetric X. An
    NS iterate carried WITHOUT re-symmetrization lets its f32 skew
    component roughly double per iteration (measured: the 26-iteration
    Gram inverse on the humanoid level-1 equality rows diverged to 1e30;
    true NS is self-correcting, the transposed substitution is not)."""
    return 0.5 * (M + jnp.swapaxes(M, 0, 1))


def _eye3(n, L, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(r == c, jnp.ones((), dtype),
                     jnp.zeros((), dtype))[:, :, None] * jnp.ones(
                         (1, 1, L), dtype)


def _diagm(v, eye):
    """Embed per-item diagonal v (n, L) as (n, n, L)."""
    return eye * v[:, None, :]


def _colmax_abs(M):
    """max over rows of |M_b|: (p, n, L) -> (n, L). Static unroll."""
    p, n, L = M.shape
    acc = jnp.zeros((n, L), M.dtype)
    for k in range(p):
        acc = jnp.maximum(acc, jnp.abs(M[k]))
    return acc


def _rowmax_abs(M):
    """max over columns (sublanes) of |M_b|: (p, n, L) -> (p, L).
    p small — unrolled."""
    p = M.shape[0]
    return jnp.concatenate(
        [jnp.max(jnp.abs(M[r]), axis=0, keepdims=True) for r in range(p)],
        axis=0)


def _vmax(v):
    """Per-lane max over the vector dim: (p, L) -> (1, L)."""
    return jnp.max(v, axis=0, keepdims=True)


def _ns_spd_inverse(G, iters):
    """linalg.spd_inverse_ns in batch-on-lanes form (Jacobi prescale +
    1-norm init), for the equality Gram matrix. G (ne, ne, L) symmetric."""
    ne, _, L = G.shape
    eye = _eye3(ne, L, G.dtype)
    dg = _diag(G)                                       # (ne, L)
    d = jax.lax.rsqrt(jnp.maximum(dg, 1e-30))
    # Ks = d[:,None] * G * d[None,:]
    Ks = G * d[:, None, :] * d[None, :, :]
    norm1 = _vmax(_colsum_abs(Ks))                      # (1, L)
    X = _diagm(jnp.broadcast_to(1.0 / jnp.maximum(norm1, 1e-30), (ne, L)),
               eye)

    def body(_, X):
        KX = _bmm(Ks, X)                     # Ks^T X = Ks X (sym)
        return _sym(_bmm(X, 2.0 * eye - KX))  # true NS + re-symmetrize

    X = jax.lax.fori_loop(0, iters, body, X)
    return X * d[:, None, :] * d[None, :, :]


def _colsum_abs(M):
    """sum over rows of |M_b|: (p, n, L) -> (n, L). Static unroll."""
    p, n, L = M.shape
    acc = jnp.zeros((n, L), M.dtype)
    for k in range(p):
        acc = acc + jnp.abs(M[k])
    return acc


def _rowsum_abs_max(M):
    """max over rows of (sum over columns of |M_b|): (n, n, L) -> (1, L).
    Static unroll."""
    n = M.shape[0]
    acc = jnp.zeros((1, M.shape[-1]), M.dtype)
    for k in range(n):
        acc = jnp.maximum(acc, jnp.sum(jnp.abs(M[k]), axis=0,
                                       keepdims=True))
    return acc


# ---------------------------------------------------------------------------
# the fused kernel
# ---------------------------------------------------------------------------

def _level_kernel(cfg: PallasQPConfig, n: int, m: int,
                  P_ref, q_ref, A_ref, l_ref, u_ref,
                  wx_ref, wz_ref, wy_ref, wK_ref, wr_ref,
                  x_o, z_o, y_o, K_o, r_o, prim_o, dual_o, obj_o):
    """One batch tile, whole level solve. Mirrors opt/qp.py::solve with
    rho_updates=0 / polish_rounds=0 — see module docstring for the scope
    and the single documented deviation (cold-budget freeze)."""
    dtype = P_ref.dtype
    L = P_ref.shape[-1]
    h, t = cfg.n_eq_head, cfg.n_eq_tail
    has_eq = (h + t) > 0
    m_in = m - h - t
    assert m_in > 0, "kernel needs at least one inequality row"
    eye_n = _eye3(n, L, dtype)

    P0 = P_ref[...]
    q0 = q_ref[...]
    A0 = A_ref[...]
    l0 = l_ref[...]
    u0 = u_ref[...]

    # Mosaic (unlike interpret mode) rejects zero-size vector slices, so
    # every head/tail split must skip its empty parts when h or t is 0.
    def _cat_ht(head, tail, axis=0):
        parts = ([head] if h > 0 else []) + ([tail] if t > 0 else [])
        return parts[0] if len(parts) == 1 else \
            jnp.concatenate(parts, axis=axis)

    def _cat_hmt(head, mid, tail, axis=0):
        parts = (([head] if h > 0 else []) + [mid]
                 + ([tail] if t > 0 else []))
        return parts[0] if len(parts) == 1 else \
            jnp.concatenate(parts, axis=axis)

    if has_eq:
        E0 = _cat_ht(A0[:h], A0[m - t:])                     # (ne, n, L)
        b_e0 = _cat_ht(l0[:h], l0[m - t:])                   # (ne, L)
        A_in0 = A0[h:m - t]
        l_in0 = l0[h:m - t]
        u_in0 = u0[h:m - t]
        ne = h + t
    else:
        A_in0, l_in0, u_in0 = A0, l0, u0

    # --- Ruiz equilibration (qp.py::_ruiz, inequality rows only) ----------
    d = jnp.ones((n, L), dtype)
    e = jnp.ones((m_in, L), dtype)
    Ps, As = P0, A_in0
    for _ in range(cfg.scale_iters):
        cn = jnp.maximum(_colmax_abs(Ps), _colmax_abs(As))
        rn = _rowmax_abs(As)
        sd = jax.lax.rsqrt(jnp.clip(cn, 1e-8, 1e8))
        se = jax.lax.rsqrt(jnp.clip(rn, 1e-8, 1e8))
        d = d * sd
        e = e * se
        Ps = Ps * sd[:, None, :] * sd[None, :, :]
        As = As * se[:, None, :] * sd[None, :, :]
    # _bmm contracts over rows (computes M^T .), so every matrix treated as
    # symmetric must be EXACTLY symmetric — see _sym's docstring.
    Ps = _sym(Ps)
    qs = d * q0

    # --- equality elimination (scaled) ------------------------------------
    if has_eq:
        Es_raw = E0 * d[None, :, :]
        R_eq = jax.lax.rsqrt(
            jnp.concatenate([jnp.sum(Es_raw[r] ** 2, axis=0, keepdims=True)
                             for r in range(ne)], axis=0) + 1e-12)  # (ne, L)
        Es = Es_raw * R_eq[:, None, :]
        b_es = R_eq * b_e0
        eye_ne = _eye3(ne, L, dtype)
        G = _pairdots(Es, Es) + 1e-6 * eye_ne
        Ginv = _ns_spd_inverse(G, cfg.gram_ns_iters)
        # Y = Ep = (E^+)^T^T stored row-outer: Y[r, c] = E^+[c, r].
        # Y0 = Ginv @ Es (Ginv symmetric -> _bmm contracts correctly).
        Y = _bmm(Ginv, Es)

        # Ben-Israel-Cohen NS pinv refinement, transposed iteration:
        # X <- X(2I - Es X) with X = Y^T  <=>  Y <- (2I - T)^T-contracted
        # via _bmm, T[r,s] = sum_c Es[r,c] Y[s,c].
        def pinv_body(_, Y):
            T = _pairdots(Es, Y)
            return _bmm(2.0 * eye_ne - T, Y)

        Y = jax.lax.fori_loop(0, cfg.pinv_ns_iters, pinv_body, Y)

        Pn = _sym(eye_n - _bmm(Y, Es))       # I - E^+ E (projector, sym)
        x_p = _bmv(Y, b_es)                  # particular solution (scaled)
        x_p = x_p + _bmv(Y, b_es - _rowdots(Es, x_p))
        Ax_p = _rowdots(As, x_p)
        q_eff = _bmv(Pn, qs + _bmv(Ps, x_p))
        ls = e * l_in0 - Ax_p
        us = e * u_in0 - Ax_p
        # warm start into reduced scaled coordinates
        x = _bmv(Pn, wx_ref[...] / d - x_p)
        z = e * wz_ref[...][h:m - t] - Ax_p
        y = wy_ref[...][h:m - t] / jnp.maximum(e, 1e-30)
    else:
        Pn = None
        q_eff = qs
        ls = e * l_in0
        us = e * u_in0
        x = wx_ref[...] / d
        z = e * wz_ref[...]
        y = wy_ref[...] / jnp.maximum(e, 1e-30)

    # --- per-row rho (qp.py::_rho_vec) ------------------------------------
    rho = jnp.asarray(cfg.rho, dtype)
    eq_row = (us - ls) < 1e-8
    loose = (ls < -1e12) & (us > 1e12)
    rho_base = jnp.where(eq_row, rho * 1e3, rho)
    rho_base = jnp.where(loose, rho * 1e-6, rho_base)
    rho_scale = jnp.clip(wr_ref[...], cfg.rho_scale_min, 1.0)   # (1, L)
    rho_v = rho_base * rho_scale                                 # (m_in, L)

    # --- KKT build --------------------------------------------------------
    sigma = jnp.asarray(cfg.sigma, dtype)
    M0 = Ps + _bmm(As, As * rho_v[:, None, :])
    if has_eq:
        pin = cfg.eq_pin * jnp.sum(_diag(M0), axis=0, keepdims=True) / n
        K = _sym(_bmm(_bmm(M0, Pn), Pn)) + (sigma + pin) * eye_n - \
            pin[:, None, :] * Pn
    else:
        K = M0 + sigma * eye_n

    # --- guarded warm Newton-Schulz inverse (qp.py::_ns_warm) -------------
    Xg = wK_ref[...]
    E = eye_n - _bmm(Xg, K)                  # Xg sym (carried NS inverse)
    err = jnp.sqrt(_vmax(_colsum_abs(E)) * _rowsum_abs_max(E))
    err = jnp.where(jnp.isfinite(err), err, jnp.asarray(2.0, dtype))
    dg = _diag(K)
    dinv = 1.0 / jnp.maximum(dg, 1e-30)
    sq = jnp.sqrt(dinv)
    Ks_norm1 = _vmax(_colsum_abs(K * sq[:, None, :] * sq[None, :, :]))
    cold = _diagm(dinv / jnp.maximum(Ks_norm1, 1e-30), eye_n)
    warm_ok = err < 0.9                      # (1, L) per-lane guard
    X = _sym(jnp.where(warm_ok[None, :, :], Xg, cold))

    def ns_body(_, X):
        return _sym(_bmm(X, 2.0 * eye_n - _bmm(K, X)))

    w_iters = cfg.warm_kinv_iters
    X = jax.lax.fori_loop(0, min(w_iters, cfg.kinv_iters), ns_body, X)
    if cfg.kinv_iters > w_iters:
        # Documented deviation: lanes can't take different branch lengths,
        # so the cold budget runs for all lanes and warm lanes are FROZEN
        # at their warm_kinv_iters iterate — exactly the lax.cond result,
        # at the cost vmap already pays for both branches.
        X_warm = X
        X = jax.lax.fori_loop(0, cfg.kinv_iters - w_iters, ns_body, X)
        X = jnp.where(warm_ok[None, :, :], X_warm, X)
    finite = jnp.all(jnp.isfinite(X), axis=(0, 1), keepdims=False)  # (L,)
    Kinv = jnp.where(finite[None, None, :], X, cold)

    # --- ADMM iterations (single rho chunk) -------------------------------
    alpha = jnp.asarray(cfg.alpha, dtype)

    def admm_body(_, carry):
        x, z, y = carry
        rhs = sigma * x - q_eff + _bmv(As, rho_v * z - y)
        x_t = _bmv(Kinv, rhs)
        if has_eq:
            x_t = _bmv(Pn, x_t)
        z_t = _rowdots(As, x_t)
        x_n = alpha * x_t + (1.0 - alpha) * x
        z_r = alpha * z_t + (1.0 - alpha) * z
        z_n = jnp.clip(z_r + y / rho_v, ls, us)
        y_n = y + rho_v * (z_r - z_n)
        return (x_n, z_n, y_n)

    x, z, y = jax.lax.fori_loop(0, cfg.iters, admm_body, (x, z, y))

    # --- scaled residuals -> rho carry (qp.py rho adapt, cross-tick) ------
    Ax = _rowdots(As, x)
    Px = _bmv(Ps, x)
    Aty = _bmv(As, y)
    prim_s = _vmax(jnp.abs(Ax - z)) / (
        jnp.maximum(_vmax(jnp.abs(Ax)), _vmax(jnp.abs(z))) + 1.0)
    stat = Px + q_eff + Aty
    if has_eq:
        stat = _bmv(Pn, stat)
    dual_s = _vmax(jnp.abs(stat)) / (
        jnp.maximum(jnp.maximum(_vmax(jnp.abs(Px)), _vmax(jnp.abs(Aty))),
                    _vmax(jnp.abs(q_eff))) + 1.0)
    factor = jnp.clip(jnp.sqrt(prim_s / jnp.maximum(dual_s, 1e-12)),
                      0.1, 10.0)
    adapt = jnp.maximum(prim_s, dual_s) > cfg.rho_adapt_tol
    factor = jnp.where(adapt, factor, jnp.ones_like(factor))
    rho_out = jnp.clip(rho_scale * factor, cfg.rho_scale_min, 1e2)

    # --- unscale + equality-multiplier recovery ---------------------------
    if has_eq:
        xs = x + x_p
        x_out = d * xs
        z_in = (z + Ax_p) / jnp.maximum(e, 1e-30)
        y_in = e * y
        nu = -_rowdots(Y, _bmv(Ps, xs) + qs + _bmv(As, y))   # (ne, L)
        y_eq = R_eq * nu
        z_full = _cat_hmt(b_e0[:h], z_in, b_e0[h:])
        y_full = _cat_hmt(y_eq[:h], y_in, y_eq[h:])
    else:
        x_out = d * x
        z_full = z / jnp.maximum(e, 1e-30)
        y_full = e * y

    # original-space products via the scaled copies (no unscaled matrices
    # are kept in VMEM): A_in0 = As/(e d), E0 = Es/(R d), P0 = Ps/(d d)
    xd = x_out / d
    Ain_x = _rowdots(As, xd) / jnp.maximum(e, 1e-30)
    P0x = _bmv(Ps, xd) / d
    if has_eq:
        E0x = _rowdots(Es, xd) / jnp.maximum(R_eq, 1e-30)
        A0x = _cat_hmt(E0x[:h], Ain_x, E0x[h:])
        # A_in0^T y_in = (As/(e d))^T (e y) = (1/d) As^T y; likewise the
        # equality rows contribute (1/d) Es^T nu (y_eq = R nu).
        A0ty = (_bmv(As, y) + _bmv(Es, nu)) / d
    else:
        A0x = Ain_x
        A0ty = _bmv(As, y) / d

    if cfg.z_clip:
        z_full = jnp.clip(A0x, l0, u0)

    prim = _vmax(jnp.abs(A0x - z_full)) / (
        jnp.maximum(_vmax(jnp.abs(A0x)), _vmax(jnp.abs(z_full))) + 1.0)
    stat0 = P0x + q0 + A0ty
    dual = _vmax(jnp.abs(stat0)) / (
        jnp.maximum(jnp.maximum(_vmax(jnp.abs(P0x)), _vmax(jnp.abs(A0ty))),
                    _vmax(jnp.abs(q0))) + 1.0)
    obj = 0.5 * jnp.sum(x_out * P0x, axis=0, keepdims=True) + \
        jnp.sum(q0 * x_out, axis=0, keepdims=True)

    x_o[...] = x_out
    z_o[...] = z_full
    y_o[...] = y_full
    K_o[...] = Kinv
    r_o[...] = rho_out
    prim_o[...] = prim
    dual_o[...] = dual
    obj_o[...] = obj


# ---------------------------------------------------------------------------
# host wrapper: transpose to batch-last, pad, grid over batch tiles
# ---------------------------------------------------------------------------

def _to_lanes(a, B):
    """(B, ...) -> (..., B): batch becomes the lane (minor) dim."""
    return jnp.moveaxis(a, 0, -1)


@functools.partial(jax.jit, static_argnums=(0,))
def solve_batched(cfg: PallasQPConfig, P, q, A, l, u,
                  wx, wz, wy, wK, wr):
    """Fused whole-solve over a batch. All args batch-FIRST:
    P (B,n,n), q (B,n), A (B,m,n), l/u (B,m), warm x (B,n), z/y (B,m),
    Kinv (B,n,n), rho_scale (B,). Returns (x, z, y, Kinv, rho_scale,
    prim, dual, obj), batch-first."""
    B, n, _ = P.shape
    m = A.shape[1]
    dtype = P.dtype
    TB = min(cfg.tile, max(8, B))
    pad = (-B) % TB
    Bp = B + pad

    args = [_to_lanes(x_, B) for x_ in (P, q, A, l, u, wx, wz, wy, wK)]
    args.append(jnp.reshape(wr, (1, B)))
    if pad:
        args = [jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)],
                        mode="edge") for a in args]

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape[:-1] + (TB,),
                            lambda i, nd=nd: (0,) * (nd - 1) + (i,),
                            memory_space=pltpu.VMEM)

    in_shapes = [(n, n, Bp), (n, Bp), (m, n, Bp), (m, Bp), (m, Bp),
                 (n, Bp), (m, Bp), (m, Bp), (n, n, Bp), (1, Bp)]
    out_shapes = [(n, Bp), (m, Bp), (m, Bp), (n, n, Bp), (1, Bp),
                  (1, Bp), (1, Bp), (1, Bp)]

    kernel = functools.partial(_level_kernel, cfg, n, m)
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // TB,),
        in_specs=[spec(s) for s in in_shapes],
        out_specs=tuple(spec(s) for s in out_shapes),
        out_shape=tuple(jax.ShapeDtypeStruct(s, dtype) for s in out_shapes),
        interpret=cfg.interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            # dominant: NS inverse (2 bmm/iter) + K build + ADMM matvecs
            flops=2 * Bp * (n * n * n * 2 * (cfg.kinv_iters + 2)
                            + cfg.iters * 4 * n * n),
            bytes_accessed=Bp * (2 * n * n + m * n + 6 * n + 8 * m) * 4,
            transcendentals=0,
        ),
    )(*args)

    x, z, y, K, r, prim, dual, obj = outs
    unlane = lambda a: jnp.moveaxis(a, -1, 0)[:B]   # noqa: E731
    return (unlane(x), unlane(z), unlane(y), unlane(K),
            jnp.reshape(r, (Bp,))[:B],
            jnp.reshape(prim, (Bp,))[:B], jnp.reshape(dual, (Bp,))[:B],
            jnp.reshape(obj, (Bp,))[:B])


# ---------------------------------------------------------------------------
# per-item facade: custom_vmap routes a vmapped qp.solve call to the kernel
# ---------------------------------------------------------------------------

def _qp_opts(cfg: PallasQPConfig) -> dict:
    return dict(iters=cfg.iters, rho=cfg.rho, sigma=cfg.sigma,
                alpha=cfg.alpha, refine=(2 if cfg.z_clip else 0),
                rho_updates=0, scale_iters=cfg.scale_iters,
                inv_method="ns", polish_rounds=0, assume_warm_kinv=True,
                warm_kinv_iters=cfg.warm_kinv_iters,
                rho_adapt_tol=cfg.rho_adapt_tol,
                rho_scale_min=cfg.rho_scale_min,
                n_eq_head=cfg.n_eq_head, n_eq_tail=cfg.n_eq_tail,
                eq_pin=cfg.eq_pin, cold_ns_iters=cfg.cold_ns_iters,
                pinv_ns_iters=cfg.pinv_ns_iters)


@functools.lru_cache(maxsize=64)
def make_level_solver(cfg: PallasQPConfig):
    """Returns solve(problem: QPProblem, state: QPState) ->
    (x, QPState, QPInfo) with qp.solve's per-item signature. Called
    unbatched it runs the XLA path; under vmap the whole batch routes into
    the fused Pallas kernel (jax.custom_batching.custom_vmap) — so the
    surrounding program (model update, stack assembly, rollout scan) stays
    an ordinary vmapped trace and only the solve becomes the kernel."""

    @custom_batching.custom_vmap
    def solve(problem: qp.QPProblem, state: qp.QPState):
        return qp.solve(problem, state, **_qp_opts(cfg))

    @solve.def_vmap
    def _rule(axis_size, in_batched, problem, state):
        def bcast(leaf, batched):
            if batched:
                return leaf
            return jnp.broadcast_to(leaf, (axis_size,) + jnp.shape(leaf))

        pb, sb = in_batched
        problem = jax.tree.map(bcast, problem, pb)
        state = jax.tree.map(bcast, state, sb)
        x, z, y, K, r, prim, dual, obj = solve_batched(
            cfg, problem.P, problem.q, problem.A, problem.l, problem.u,
            state.x, state.z, state.y, state.Kinv, state.rho_scale)
        out = (x, qp.QPState(x=x, z=z, y=y, Kinv=K, rho_scale=r),
               qp.QPInfo(prim_res=prim, dual_res=dual, obj=obj))
        out_batched = jax.tree.map(lambda _: True, out)
        return out, out_batched

    return solve


def config_from_opts(opts: dict, *, n_eq_head: int, n_eq_tail: int,
                     iters: int, interpret: Optional[bool] = None,
                     ) -> Optional[PallasQPConfig]:
    """Map hierarchy/qp solver kwargs onto a kernel config; None when the
    requested profile is outside the kernel's scope (caller falls back to
    the XLA path)."""
    if opts.get("rho_updates", 3) != 0:
        return None
    if opts.get("polish_rounds", 2) != 0:
        return None
    if not opts.get("assume_warm_kinv", False):
        return None
    if opts.get("inv_method", "ns") != "ns":
        return None
    if interpret is None:
        interpret = not on_tpu()
    return PallasQPConfig(
        iters=iters,
        rho=opts.get("rho", 0.1),
        sigma=opts.get("sigma", 1e-6),
        alpha=opts.get("alpha", 1.6),
        warm_kinv_iters=opts.get("warm_kinv_iters", 12),
        cold_ns_iters=opts.get("cold_ns_iters", None),
        scale_iters=opts.get("scale_iters", 5),
        pinv_ns_iters=opts.get("pinv_ns_iters", 7),
        rho_adapt_tol=opts.get("rho_adapt_tol", 0.0),
        rho_scale_min=opts.get("rho_scale_min", 1e-2),
        n_eq_head=n_eq_head, n_eq_tail=n_eq_tail,
        eq_pin=opts.get("eq_pin", 1.0),
        z_clip=opts.get("refine", 2) > 0,
        interpret=bool(interpret))
