"""Matmul-precision policy.

On TPU, f32 matmuls default to bf16-input passes. For bulk ML that is the
right trade; for this framework's iterative numerics it is not: the
Newton-Schulz inverse and the ADMM/KKT applies *diverge to NaN* under bf16
inputs (measured on v5e: a humanoid WBC tick returns prim_res=NaN at
default precision and 1.4e-4 with f32-pinned matmuls; the NaN then trips
the zero-torque fallback). Every public step/solve entry point therefore
pins `jax.default_matmul_precision("float32")` around its trace. bf16 stays
available for bulk rollout physics where a caller opts in explicitly.
"""
from __future__ import annotations

import functools

import jax

_PRECISION = "float32"


def f32_matmuls(fn):
    """Decorator: trace ``fn`` under float32 matmul precision."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision(_PRECISION):
            return fn(*args, **kwargs)
    return wrapped


class matmul_f32:
    """Context manager alias (``with matmul_f32():``)."""

    def __init__(self):
        self._cm = None

    def __enter__(self):
        self._cm = jax.default_matmul_precision(_PRECISION)
        return self._cm.__enter__()

    def __exit__(self, *exc):
        return self._cm.__exit__(*exc)
