"""Pallas TPU kernel: batched Newton-Schulz SPD inverse (measured experiment).

The NS inverse is the hottest op of the QP hot loop (2 GEMMs x ~26
iterations per KKT matrix). This kernel pins K and the iterate X in VMEM for
the whole iteration loop.

MEASURED RESULT (bench_pallas.py, TPU v5e, B=1024 n=64 iters=26):
    xla_ns    0.169 ms  (6.0M inverses/s)
    pallas_ns 8.1   ms  (0.13M inverses/s)
XLA wins 48x: its batched GEMM tiles the *batch* dimension onto the MXU,
while this kernel's per-problem 64x64 dots serialize on a single core. The
default solver path therefore stays on opt/linalg.py (XLA batched GEMMs);
this kernel is kept as the documented negative result + Pallas scaffolding
(grid/BlockSpec/fori_loop/VMEM patterns) for future fused-step kernels
where XLA's fusion actually falls short.

Numerics match linalg.spd_inverse_ns (Jacobi pre-scaling + ||.||_1 init);
cross-checked in tests/test_pallas_linalg.py. Falls back to interpret mode
off-TPU so the same code path is unit-testable on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ns_kernel(iters: int, K_ref, out_ref):
    """One batch tile: (TB, n, n) SPD matrices -> inverses."""
    TB, n, _ = K_ref.shape
    I = jnp.eye(n, dtype=K_ref.dtype)
    for p in range(TB):  # static unroll over the tile
        K = K_ref[p]
        # Jacobi pre-scaling K' = D K D, D = diag(K)^(-1/2)
        dg = jnp.sum(K * I, axis=1, keepdims=True)          # (n, 1) diagonal
        d = jax.lax.rsqrt(jnp.maximum(dg, 1e-30))           # (n, 1)
        Ks = d * K * d.T
        norm1 = jnp.max(jnp.sum(jnp.abs(Ks), axis=0))
        X0 = I * (1.0 / jnp.maximum(norm1, 1e-30))

        def body(_, X):
            KX = jnp.dot(Ks, X, preferred_element_type=jnp.float32)
            return jnp.dot(X, 2.0 * I - KX,
                           preferred_element_type=jnp.float32)

        X = jax.lax.fori_loop(0, iters, body, X0)
        out_ref[p] = d * X * d.T


@functools.partial(jax.jit, static_argnames=("iters", "tile", "interpret"))
def ns_inverse_pallas(K: jax.Array, iters: int = 26, tile: int = 8,
                      interpret: bool = False) -> jax.Array:
    """Batched SPD inverse: K (B, n, n) -> (B, n, n). B padded to ``tile``."""
    B, n, _ = K.shape
    pad = (-B) % tile
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), (pad, n, n))
        K = jnp.concatenate([K, eye], axis=0)
    Bp = K.shape[0]
    out = pl.pallas_call(
        functools.partial(_ns_kernel, iters),
        out_shape=jax.ShapeDtypeStruct((Bp, n, n), K.dtype),
        grid=(Bp // tile,),
        in_specs=[pl.BlockSpec((tile, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.ANY if False else pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Bp * iters * n * n * n,
            bytes_accessed=2 * Bp * n * n * 4,
            transcendentals=0,
        ),
    )(K)
    return out[:B]


def ns_inverse_auto(K: jax.Array, iters: int = 26) -> jax.Array:
    """Pallas on TPU, interpret elsewhere (tests)."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    return ns_inverse_pallas(K, iters=iters, interpret=not on_tpu)
