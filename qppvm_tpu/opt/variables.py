"""Optimization-variable algebra: named segments of a stacked QP decision
variable and affine views over it.

Re-designs OpenSoT's ``OptvarHelper`` / ``AffineHelper``
(/root/reference/src/ForceAcc.cpp:63-81,196-199): the reference builds
``x = [qddot(n); wrench_fl(3); ...]`` and hands each task an affine view.
Here the same bookkeeping is a static index map resolved entirely at trace
time — an ``AffineExpr`` is just ``(M, c)`` with value ``M @ x + c``, so task
matrices composed through it stay one fused XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AffineExpr:
    """value(x) = M @ x + c.  M may be a numpy (static) or jax array."""

    M: jax.Array  # (k, n)
    c: jax.Array  # (k,)

    @property
    def size(self) -> int:
        return self.M.shape[0]

    @property
    def input_size(self) -> int:
        return self.M.shape[1]

    def value(self, x):
        """Extract this expression's value from a solution vector
        (AffineHelper::getValue, /root/reference/src/ForceAcc.cpp:196-199)."""
        return self.M @ x + self.c

    # --- algebra --------------------------------------------------------
    def __truediv__(self, other: "AffineExpr") -> "AffineExpr":
        """Vertical concatenation (OpenSoT's ``/`` on AffineHelper,
        /root/reference/src/ForceAcc.cpp:81)."""
        return AffineExpr(
            M=jnp.concatenate([jnp.asarray(self.M), jnp.asarray(other.M)], axis=0),
            c=jnp.concatenate([jnp.asarray(self.c), jnp.asarray(other.c)], axis=0),
        )

    def __add__(self, other):
        if isinstance(other, AffineExpr):
            return AffineExpr(M=self.M + other.M, c=self.c + other.c)
        return AffineExpr(M=self.M, c=self.c + jnp.asarray(other))

    def __sub__(self, other):
        if isinstance(other, AffineExpr):
            return AffineExpr(M=self.M - other.M, c=self.c - other.c)
        return AffineExpr(M=self.M, c=self.c - jnp.asarray(other))

    def __neg__(self):
        return AffineExpr(M=-self.M, c=-self.c)

    def __rmatmul__(self, A) -> "AffineExpr":
        """Left-compose with a matrix: A @ expr."""
        A = jnp.asarray(A)
        return AffineExpr(M=A @ self.M, c=A @ self.c)

    def rows(self, idx) -> "AffineExpr":
        """Row selection (SubTask/Indices analog on expressions)."""
        idx = np.asarray(idx)
        return AffineExpr(M=jnp.asarray(self.M)[idx], c=jnp.asarray(self.c)[idx])

    @staticmethod
    def zero(input_size: int, k: int, dtype=jnp.float32) -> "AffineExpr":
        """AffineHelper::Zero (/root/reference/src/ForceAcc.cpp:81)."""
        return AffineExpr(M=jnp.zeros((k, input_size), dtype),
                          c=jnp.zeros((k,), dtype))


class Optvar:
    """Named segments of one stacked decision variable
    (OptvarHelper, /root/reference/src/ForceAcc.cpp:63-72)."""

    def __init__(self, variables: Sequence[Tuple[str, int]], dtype=jnp.float32):
        self._slices: Dict[str, slice] = {}
        self.dtype = dtype
        off = 0
        for name, sz in variables:
            if name in self._slices:
                raise ValueError(f"duplicate variable {name!r}")
            self._slices[name] = slice(off, off + sz)
            off += sz
        self.size = off

    def __getitem__(self, name: str) -> AffineExpr:
        s = self._slices[name]
        M = np.zeros((s.stop - s.start, self.size), dtype=np.float64)
        M[:, s] = np.eye(s.stop - s.start)
        return AffineExpr(M=jnp.asarray(M, self.dtype),
                          c=jnp.zeros(s.stop - s.start, self.dtype))

    def slice_of(self, name: str) -> slice:
        return self._slices[name]

    def names(self) -> List[str]:
        return list(self._slices)
