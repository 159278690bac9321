"""Task/constraint protocol and aggregation — the L4 layer of SURVEY.md §1.

A *task* is a pure builder: given the per-tick ``AssembleCtx`` it emits
``(A, b)`` with ``min ||A x - b||^2`` semantics. A *constraint* emits either a
box on x or general rows ``l <= C x <= u``. Aggregation (`+`), priority
(`/`) and constraint attachment (`<<`) build an ``AutoStack``
(see qppvm_tpu.stack.autostack), mirroring OpenSoT's DSL
(/root/reference/src/QPPVMPlugin.cpp:177-179, /root/reference/src/ForceAcc.cpp:131-133).

Statefulness note: reference tasks are mutable objects updated per tick
(``setReference``/``update``). Here references live in an explicit ``refs``
pytree passed through the jitted step; task objects hold only *static*
configuration, so one compiled program serves the whole session.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model.dynamics import ModelData
from qppvm_tpu.model.robot import RobotModel, RobotState


@dataclasses.dataclass
class AssembleCtx:
    """Everything a task may consume during assembly (one control tick)."""

    model: RobotModel
    data: ModelData
    state: RobotState
    refs: Dict[str, Any]
    nx: int  # decision-variable size
    dtype: Any = jnp.float32


class Task:
    """Base task. Subclasses set ``name`` and implement ``assemble``."""

    name: str = "task"
    weight: float = 1.0

    # -- interface -------------------------------------------------------
    def assemble(self, ctx: AssembleCtx):
        """Return (A, b) for min ||A x - b||^2 (rows already weighted)."""
        raise NotImplementedError

    def ref_init(self, model: RobotModel, data: ModelData, state: RobotState):
        """Default reference pytree captured at start (bumpless start,
        /root/reference/src/QPPVMPlugin.cpp:271-279)."""
        return {}

    # -- DSL -------------------------------------------------------------
    def __add__(self, other: "Task") -> "AggregatedTask":
        mine = self.tasks if isinstance(self, AggregatedTask) else [self]
        theirs = other.tasks if isinstance(other, AggregatedTask) else [other]
        return AggregatedTask(mine + theirs)

    def __truediv__(self, other):
        from qppvm_tpu.stack.autostack import AutoStack
        return AutoStack([self]) / other

    def __lshift__(self, constraint):
        from qppvm_tpu.stack.autostack import AutoStack
        return AutoStack([self]) << constraint

    def base_tasks(self):
        return [self]


class AggregatedTask(Task):
    """`t1 + t2`: row-stacked tasks at the same priority
    (/root/reference/src/QPPVMPlugin.cpp:177: ``_ee_task_right + _ee_task_left``)."""

    def __init__(self, tasks: Sequence[Task]):
        self.tasks = list(tasks)
        self.name = "+".join(t.name for t in self.tasks)

    def assemble(self, ctx: AssembleCtx):
        As, bs = [], []
        for t in self.tasks:
            A, b = t.assemble(ctx)
            As.append(A)
            bs.append(b)
        return jnp.concatenate(As, axis=0), jnp.concatenate(bs, axis=0)

    def base_tasks(self):
        out = []
        for t in self.tasks:
            out.extend(t.base_tasks())
        return out


class SubTask(Task):
    """Row-slice of another task (OpenSoT SubTask/Indices,
    /root/reference/src/ForceAcc.cpp:125-129, QPPVMPlugin.cpp:134)."""

    def __init__(self, task: Task, indices: Sequence[int], name: Optional[str] = None):
        self.task = task
        self.indices = np.asarray(list(indices), dtype=np.int32)
        self.name = name or f"{task.name}[{list(indices)}]"

    def assemble(self, ctx: AssembleCtx):
        A, b = self.task.assemble(ctx)
        return A[self.indices], b[self.indices]

    def ref_init(self, model, data, state):
        return self.task.ref_init(model, data, state)

    def base_tasks(self):
        return self.task.base_tasks()


class Indices:
    """OpenSoT::Indices::range analog (/root/reference/src/QPPVMPlugin.cpp:134)."""

    @staticmethod
    def range(lo: int, hi: int):
        """Inclusive range, matching OpenSoT semantics (range(0,2) = rows 0..2)."""
        return list(range(lo, hi + 1))


BOX = "box"
ROWS = "rows"


class Constraint:
    """Base constraint; emits (kind, C_or_None, lb, ub).

    ``is_equality`` (static): True for constraints whose rows are ALWAYS
    equalities (l == u by construction, e.g. DynamicFeasibility) — the
    stack builder orders them first and the solver eliminates them by
    projection (opt/qp.py). Gate-driven runtime equalities stay False.
    """

    name: str = "constraint"
    is_equality: bool = False

    def assemble(self, ctx: AssembleCtx):
        raise NotImplementedError
