"""Stateful ModelInterface — API-parity convenience wrapper over the pure
functional core, mirroring the XBot::ModelInterface surface the reference
exercises (SURVEY.md §2b C16). Each method cites the reference call site it
covers. The pure functions in kinematics/dynamics remain the jit/vmap path;
this wrapper is for interactive use, tests and porting user code.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qppvm_tpu.model import dynamics, kinematics, zoo
from qppvm_tpu.model.robot import RobotModel, RobotState


class ModelInterface:
    """Holds a RobotModel + current RobotState + lazily-computed ModelData."""

    def __init__(self, model: RobotModel, dtype=jnp.float32):
        self.model = model
        self.dtype = dtype
        self.state = model.home_state()
        self._data: Optional[dynamics.ModelData] = None

    # --- construction ---------------------------------------------------
    @staticmethod
    def get_model(source: str, **kw) -> "ModelInterface":
        """Load from a URDF path/string or a zoo name
        (XBot getModel(config), /root/reference/src/QPPVMPlugin.cpp:50)."""
        try:
            return ModelInterface(zoo.by_name(source))
        except KeyError:
            from qppvm_tpu.model.urdf import load_urdf
            return ModelInterface(load_urdf(source, **kw))

    # --- state I/O ------------------------------------------------------
    def set_joint_position(self, q) -> None:
        """/root/reference/src/QPPVMPlugin.cpp:70,347"""
        self.state = dataclasses.replace(self.state,
                                         q=jnp.asarray(q, self.dtype))
        self._data = None

    def set_joint_velocity(self, qd) -> None:
        """/root/reference/src/QPPVMPlugin.cpp:71,350"""
        self.state = dataclasses.replace(self.state,
                                         qd=jnp.asarray(qd, self.dtype))
        self._data = None

    def set_joint_acceleration(self, qddot) -> None:
        """/root/reference/src/ForceAcc.cpp:213 (stored for ID)"""
        self._qddot = jnp.asarray(qddot, self.dtype)

    def set_joint_effort(self, tau) -> None:
        """/root/reference/src/QPPVMPlugin.cpp:318"""
        self._tau = jnp.asarray(tau, self.dtype)

    def set_floating_base_state(self, R, p, twist_world_linfirst) -> None:
        """/root/reference/src/ForceAcc.cpp:274: world pose + world twist
        ([v; w] linear-first public convention)."""
        R = jnp.asarray(R, self.dtype)
        tw = jnp.asarray(twist_world_linfirst, self.dtype)
        v_b = jnp.einsum("ji,j->i", R, tw[:3])
        w_b = jnp.einsum("ji,j->i", R, tw[3:])
        self.state = dataclasses.replace(
            self.state, base_rot=R, base_pos=jnp.asarray(p, self.dtype),
            base_vel=jnp.concatenate([w_b, v_b]))
        self._data = None

    def get_floating_base_pose(self):
        """/root/reference/src/ForceAcc.cpp:279"""
        return self.state.base_rot, self.state.base_pos

    def get_joint_position(self):
        """/root/reference/src/QPPVMPlugin.cpp:334"""
        return self.state.q

    def get_joint_velocity(self):
        return self.state.qd

    def sync_from(self, robot) -> None:
        """model->syncFrom(robot) (/root/reference/src/ForceAcc.cpp:258)."""
        self.set_joint_position(robot.get_motor_position())
        self.set_joint_velocity(robot.get_motor_velocity())
        if self.model.floating and hasattr(robot, "state"):
            st = robot.state
            self.state = dataclasses.replace(
                self.state, base_rot=st.base_rot, base_pos=st.base_pos,
                base_vel=st.base_vel)
        self._data = None

    def update(self) -> None:
        """Recompute FK/dynamics caches (model->update(),
        /root/reference/src/QPPVMPlugin.cpp:352)."""
        self._data = dynamics.compute_model_data(self.model, self.state)

    @property
    def data(self) -> dynamics.ModelData:
        if self._data is None:
            self.update()
        return self._data

    def init_log(self, trace, capacity: Optional[int] = None) -> None:
        """model->initLog(logger, n) (/root/reference/src/QPPVMPlugin.cpp:54):
        preallocate the trace capacity before the RT loop starts."""
        if capacity is not None:
            trace.capacity = capacity
        self._trace = trace

    def log(self, trace=None) -> None:
        """model->log (/root/reference/src/QPPVMPlugin.cpp:325): full model
        state into the trace buffer."""
        import numpy as np
        trace = trace if trace is not None else getattr(self, "_trace", None)
        if trace is None:
            return
        trace.add("model/q", np.asarray(self.state.q))
        trace.add("model/qd", np.asarray(self.state.qd))
        if self.model.floating:
            trace.add("model/base_pos", np.asarray(self.state.base_pos))
            trace.add("model/base_vel", np.asarray(self.state.base_vel))
        trace.add("model/com", np.asarray(self.data.com_pos))

    # --- queries --------------------------------------------------------
    def get_joint_num(self) -> int:
        """/root/reference/src/QPPVMPlugin.cpp:61"""
        return self.model.nj

    def get_dof_index(self, joint_name: str) -> int:
        """/root/reference/src/QPPVMPlugin.cpp:84-96"""
        return self.model.dof_index(joint_name)

    def get_effort_limits(self):
        """/root/reference/src/QPPVMPlugin.cpp:56"""
        return self.model.tau_max

    def get_joint_limits(self):
        """/root/reference/src/QPPVMPlugin.cpp:120"""
        return self.model.q_min, self.model.q_max

    def get_robot_state(self, name: str):
        """Named configurations (/root/reference/src/QPPVMPlugin.cpp:69)."""
        if name != "home":
            raise KeyError(name)
        return self.model.q_home

    def get_pose(self, link: str):
        """/root/reference/src/QPPVMPlugin.cpp:272"""
        return kinematics.link_pose(self.model, self.data.kin, link)

    def get_point_position(self, link: str, local_point):
        """/root/reference/src/ForceAcc.cpp:164"""
        return kinematics.point_position(self.model, self.data.kin, link,
                                         local_point)

    def get_jacobian(self, link: str):
        """/root/reference/src/ForceAcc.cpp:208"""
        return dynamics.frame_data(self.model, self.data, link)[2]

    def get_com(self):
        _, c = kinematics.com(self.model, self.data.kin)
        return c

    def get_inertia_matrix(self):
        """B(q) (useInertiaMatrix, /root/reference/src/QPPVMPlugin.cpp:117)"""
        return self.data.B

    def compute_nonlinear_term(self):
        """/root/reference/src/QPPVMPlugin.cpp:65,264,312"""
        return self.data.h

    def compute_inverse_dynamics(self, qddot=None):
        """/root/reference/src/ForceAcc.cpp:217"""
        if qddot is None:
            qddot = getattr(self, "_qddot", jnp.zeros(self.model.nv,
                                                      self.dtype))
        return dynamics.inverse_dynamics(self.model, self.state,
                                         jnp.asarray(qddot, self.dtype),
                                         kin=self.data.kin)

    def compute_gravity_compensation(self):
        st0 = dataclasses.replace(self.state,
                                  qd=jnp.zeros_like(self.state.qd),
                                  base_vel=jnp.zeros_like(self.state.base_vel))
        return dynamics.nonlinear_term(self.model, st0)
