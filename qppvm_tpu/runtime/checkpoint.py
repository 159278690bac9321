"""Checkpoint / resume of a control session.

The reference has none (SURVEY.md §5); the closest analogs are the named
"home" posture and the bumpless-start reference capture. Here the entire
session state — robot state, task references, QP warm starts (including the
carried KKT inverses and adapted rho), MPC plan — is an explicit pytree, so
checkpointing is a flatten + ``.npz`` save, and resume restores bit-identical
warm-started control.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _keystr(path) -> str:
    return jax.tree_util.keystr(path)


def save(path: str, tree: Any) -> str:
    """Save any pytree of arrays to ``path`` (.npz appended if missing)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    data = {}
    for kp, leaf in flat:
        data[_keystr(kp)] = np.asarray(leaf)
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(path, **data)
    return path


def load(path: str, example: Any) -> Any:
    """Restore a pytree with the structure of ``example`` from ``path``."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(example)
    leaves = []
    for kp, ex_leaf in flat:
        key = _keystr(kp)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = jnp.asarray(data[key], jnp.asarray(ex_leaf).dtype)
        if arr.shape != jnp.asarray(ex_leaf).shape:
            raise ValueError(
                f"shape mismatch for {key!r}: checkpoint {arr.shape} vs "
                f"live {jnp.asarray(ex_leaf).shape}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_session(path: str, *, state, refs, warm, plan=None) -> str:
    """Convenience: checkpoint a whole control/MPC session."""
    session = {"state": state, "refs": refs, "warm": warm}
    if plan is not None:
        session["plan"] = plan
    return save(path, session)


def load_session(path: str, *, state, refs, warm, plan=None):
    example = {"state": state, "refs": refs, "warm": warm}
    if plan is not None:
        example["plan"] = plan
    out = load(path, example)
    if plan is not None:
        return out["state"], out["refs"], out["warm"], out["plan"]
    return out["state"], out["refs"], out["warm"]
