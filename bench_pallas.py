"""Microbenchmark: Pallas fused NS inverse vs the XLA batched-GEMM path.

Usage: python bench_pallas.py [--batch 1024] [--n 64] [--iters 26]
Prints one JSON line per variant.
"""
import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from qppvm_tpu.opt import linalg
from qppvm_tpu.opt.pallas_linalg import ns_inverse_pallas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--iters", type=int, default=26)
    ap.add_argument("--tile", type=int, default=8)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    M = jax.random.normal(key, (args.batch, args.n, args.n), jnp.float32)
    K = jnp.einsum("bij,bkj->bik", M, M) + 0.5 * jnp.eye(args.n)[None]

    on_tpu = jax.default_backend() in ("tpu", "axon")
    variants = {
        "xla_ns": jax.jit(lambda K: linalg.spd_inverse_ns(K, iters=args.iters)),
        "pallas_ns": lambda K: ns_inverse_pallas(
            K, iters=args.iters, tile=args.tile, interpret=not on_tpu),
    }
    I = jnp.eye(args.n, dtype=jnp.float32)
    for name, fn in variants.items():
        X = fn(K)
        X.block_until_ready()
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            X = fn(K)
        X.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        res = float(jnp.max(jnp.abs(K @ X - I[None])))
        print(json.dumps({
            "variant": name, "batch": args.batch, "n": args.n,
            "iters": args.iters, "ms": round(dt * 1e3, 3),
            "inverses_per_s": round(args.batch / dt, 1),
            "residual": res,
        }))


if __name__ == "__main__":
    main()
